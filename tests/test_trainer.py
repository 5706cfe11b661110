"""End-to-end train-step tests: forward, loss dispatch, optimization, sharding.

Exercises the functional training engine on tiny shapes, mirroring the
reference's recipe space: the Monodepth2-style baseline (min-reprojection +
automask + smoothness), the KBR config (learned K), and the kitchen-sink
`cfg/default.yaml` path (virtual stereo + masks + autoencoder + hints).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowtv_monodepth_tpu import parsers
from slowtv_monodepth_tpu.core import MonoDepthTrainer, aspect_ratio_aug
from slowtv_monodepth_tpu.parallel import make_mesh, make_train_step, shard_batch

B, H, W = 2, 32, 64


def make_cfg(**over):
    cfg = {
        'net': {
            'depth': {'enc_name': 'resnet18', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': [0, 1]},
            'pose': {'enc_name': 'resnet18', 'pretrained': False, 'learn_K': False},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        'trainer': {'min_depth': 0.1, 'max_depth': 100, 'always_fwd_pose': False},
    }
    for k, v in over.items():
        cfg[k] = {**cfg.get(k, {}), **v} if isinstance(v, dict) else v
    return cfg


def make_batch(rng, n_supp=2, stereo=False, depth=False, hints=False, b=B, h=H, w=W):
    ks = list(jax.random.split(rng, 8))
    imgs = jax.random.uniform(ks[0], (b, h, w, 3))
    supp = jax.random.uniform(ks[1], (n_supp, b, h, w, 3))
    K = jnp.broadcast_to(jnp.array(
        [[0.5 * w, 0, 0.5 * w, 0], [0, 0.5 * h, 0.5 * h, 0],
         [0, 0, 1, 0], [0, 0, 0, 1.]]), (b, 4, 4))
    x = {'imgs': imgs, 'supp_imgs': supp}
    y = {'imgs': imgs, 'supp_imgs': supp, 'K': K}
    if stereo:
        T = jnp.broadcast_to(jnp.eye(4), (b, 4, 4)).at[:, 0, 3].set(0.1)
        y['T_stereo'] = T
    if depth:
        y['depth'] = 1 + 50 * jax.random.uniform(ks[2], (b, h, w, 1))
    if hints:
        y['depth_hints'] = 1 + 50 * jax.random.uniform(ks[3], (b, h, w, 1))
    return x, y


class TestTrainStep:
    def _run(self, cfg, supp_idxs, batch, n_steps=2):
        trainer = MonoDepthTrainer(cfg)
        tx = parsers.make_optimizer(cfg)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng, batch[0], supp_idxs, tx)
        step = make_train_step(trainer, supp_idxs, tx, donate=False)
        scalars = None
        for i in range(n_steps):
            state, scalars = step(state, batch[0], batch[1], jax.random.PRNGKey(i))
        return state, scalars

    def test_baseline_trains(self):
        """Monodepth2-style: loss finite, params change, step increments."""
        cfg = make_cfg()
        batch = make_batch(jax.random.PRNGKey(1))
        trainer = MonoDepthTrainer(cfg)
        tx = parsers.make_optimizer(cfg)
        state0 = trainer.init_state(jax.random.PRNGKey(0), batch[0], (-1, 1), tx)
        p0 = jax.tree_util.tree_map(lambda v: np.asarray(v), state0.params)

        step = make_train_step(trainer, (-1, 1), tx, donate=False)
        state, scalars = step(state0, batch[0], batch[1], jax.random.PRNGKey(2))

        assert np.isfinite(float(scalars['loss']))
        assert int(state.step) == 1
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.params, p0)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0

    def test_nan_tripwire_reports_first_bad_step(self):
        """Poisoned batch at step k -> `bad_step == k`, sticky through later
        (also-NaN) steps, and `MonoDepthLoop._check_anomaly` raises with the
        index (reference `DetectAnomaly` coverage without per-step syncs)."""
        cfg = make_cfg()
        batch = make_batch(jax.random.PRNGKey(1))
        trainer = MonoDepthTrainer(cfg)
        tx = parsers.make_optimizer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch[0], (-1, 1), tx)
        step = make_train_step(trainer, (-1, 1), tx, donate=False)

        bad_x = {**batch[0], 'imgs': batch[0]['imgs'].at[0, 0, 0, 0].set(jnp.nan)}
        bad_y = {**batch[1], 'imgs': bad_x['imgs']}
        k = 2
        for i in range(4):
            x, y = (bad_x, bad_y) if i == k else batch
            state, scalars = step(state, x, y, jax.random.PRNGKey(i))
        assert int(state.bad_step) == k

        from slowtv_monodepth_tpu.core import MonoDepthLoop
        loop = MonoDepthLoop.__new__(MonoDepthLoop)
        loop.state = state
        with pytest.raises(ValueError, match=f'first at step {k}'):
            loop._check_anomaly()

    def test_learn_K(self):
        """KBR: pose net predicts K; fx/cx scalars present & finite."""
        cfg = make_cfg(net={'pose': {'enc_name': 'resnet18', 'pretrained': False,
                                     'learn_K': True}})
        batch = make_batch(jax.random.PRNGKey(1))
        _, scalars = self._run(cfg, (-1, 1), batch, n_steps=1)
        assert np.isfinite(float(scalars['fx']))
        assert np.isfinite(float(scalars['cx']))

    def test_metrics_with_depth(self):
        cfg = make_cfg()
        batch = make_batch(jax.random.PRNGKey(1), depth=True)
        _, scalars = self._run(cfg, (-1, 1), batch, n_steps=1)
        for k in ('MAE', 'RMSE', 'LogSI', 'AbsRel', 'Acc'):
            assert np.isfinite(float(scalars[k])), k

    def test_virtual_stereo_hints(self):
        """Monodepth2-MS-class: virtual stereo + stereo consistency + hints
        (+occ). NOTE: the reference never predicts `mask_stereo`
        (`src/networks/depth.py:89-93`), so masks & virtual stereo are
        mutually exclusive recipe families."""
        cfg = make_cfg(
            net={
                'depth': {'enc_name': 'resnet18', 'pretrained': False,
                          'dec_name': 'monodepth', 'out_scales': [0, 1],
                          'use_virtual_stereo': True},
                'pose': {'enc_name': 'resnet18', 'pretrained': False, 'learn_K': False},
            },
            loss={
                'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
                'stereo_const': {'weight': 1, 'loss_name': 'l1'},
                'depth_regr': {'weight': 1, 'loss_name': 'log_l1', 'use_automask': True},
                'disp_smooth': {'weight': 0.001, 'use_edges': True},
                'disp_occ': {'weight': 0.01},
            },
        )
        batch = make_batch(jax.random.PRNGKey(1), n_supp=3, stereo=True)
        batch[1]['depth_hints'] = 1 + 50 * jax.random.uniform(
            jax.random.PRNGKey(7), (B, H, W, 1))
        _, scalars = self._run(cfg, (-1, 1, 0), batch, n_steps=1)
        assert np.isfinite(float(scalars['loss']))
        for k in ('loss_img_recon', 'loss_stereo_const', 'loss_depth_regr',
                  'loss_stereo_img_recon', 'loss_disp_occ'):
            assert np.isfinite(float(scalars[k])), k

    def test_masks_autoencoder_feat(self):
        """SfmLearner/FeatDepth-class: explainability masks + autoencoder +
        feature reconstruction/smoothness losses."""
        cfg = make_cfg(
            net={
                'depth': {'enc_name': 'resnet18', 'pretrained': False,
                          'dec_name': 'monodepth', 'out_scales': [0, 1],
                          'mask_name': 'explainability', 'num_ch_mask': 2},
                'autoencoder': {'enc_name': 'resnet18', 'pretrained': False,
                                'dec_name': 'monodepth', 'out_scales': [0, 1]},
                'pose': {'enc_name': 'resnet18', 'pretrained': False, 'learn_K': False},
            },
            loss={
                'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True,
                              'mask_name': 'explainability'},
                'feat_recon': {'weight': 0.01, 'loss_name': 'l2', 'use_min': True,
                               'use_automask': True, 'mask_name': 'explainability'},
                'autoenc_recon': {'weight': 1},
                'feat_peaky': {'weight': 0.0001, 'use_edges': True},
                'feat_smooth': {'weight': 0.0001, 'use_edges': True},
                'disp_mask': {'weight': 0.2},
            },
        )
        batch = make_batch(jax.random.PRNGKey(1), n_supp=2)
        _, scalars = self._run(cfg, (-1, 1), batch, n_steps=1)
        assert np.isfinite(float(scalars['loss']))
        for k in ('loss_img_recon', 'loss_feat_recon', 'loss_autoenc_recon',
                  'loss_disp_mask', 'loss_feat_peaky'):
            assert np.isfinite(float(scalars[k])), k

    def test_val_step_pure(self):
        """Eval step leaves state untouched."""
        cfg = make_cfg()
        batch = make_batch(jax.random.PRNGKey(1))
        trainer = MonoDepthTrainer(cfg)
        tx = parsers.make_optimizer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch[0], (-1, 1), tx)
        step = make_train_step(trainer, (-1, 1), tx, train=False, donate=False)
        state2, scalars = step(state, batch[0], batch[1], jax.random.PRNGKey(2))
        assert int(state2.step) == 0
        assert np.isfinite(float(scalars['loss']))


class TestSharded:
    def test_mesh_train_step(self):
        """Full DP train step over the virtual 8-device mesh."""
        mesh = make_mesh(8)
        cfg = make_cfg()
        batch = make_batch(jax.random.PRNGKey(1), b=8)
        trainer = MonoDepthTrainer(cfg)
        tx = parsers.make_optimizer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch[0], (-1, 1), tx)
        with mesh:
            xb, yb = shard_batch(mesh, batch)
            step = make_train_step(trainer, (-1, 1), tx, mesh=mesh, donate=False)
            state, scalars = step(state, xb, yb, jax.random.PRNGKey(2))
        assert np.isfinite(float(scalars['loss']))
        assert int(state.step) == 1

    def test_sharded_matches_single(self):
        """DP over 8 devices computes the same loss as single-device."""
        cfg = make_cfg()
        batch = make_batch(jax.random.PRNGKey(1), b=8)
        trainer = MonoDepthTrainer(cfg)
        tx = parsers.make_optimizer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch[0], (-1, 1), tx)

        step1 = make_train_step(trainer, (-1, 1), tx, donate=False)
        _, s1 = step1(state, batch[0], batch[1], jax.random.PRNGKey(2))

        mesh = make_mesh(8)
        with mesh:
            xb, yb = shard_batch(mesh, batch)
            step8 = make_train_step(trainer, (-1, 1), tx, mesh=mesh, donate=False)
            _, s8 = step8(state, xb, yb, jax.random.PRNGKey(2))
        np.testing.assert_allclose(float(s1['loss']), float(s8['loss']), rtol=1e-4)

    @pytest.mark.slow
    def test_sharded_matches_single_bench_shape(self):
        """Shape-realistic DP correctness: batch 8 @ 192x320 over the 8-device
        mesh gives the single-device loss with exactly one compile (backs the
        driver's `dryrun_multichip` with a bench-scale check)."""
        cfg = make_cfg()
        batch = make_batch(jax.random.PRNGKey(3), b=8, h=192, w=320)
        trainer = MonoDepthTrainer(cfg)
        tx = parsers.make_optimizer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch[0], (-1, 1), tx)

        step1 = make_train_step(trainer, (-1, 1), tx, donate=False)
        _, s1 = step1(state, batch[0], batch[1], jax.random.PRNGKey(2))

        mesh = make_mesh(8)
        from slowtv_monodepth_tpu.parallel import replicated
        with mesh:
            xb, yb = shard_batch(mesh, batch)
            # Replicate up front (as the loop does) so steady state is ONE
            # executable: jit keys on input shardings.
            state_r = jax.device_put(state, replicated(mesh))
            step8 = make_train_step(trainer, (-1, 1), tx, mesh=mesh, donate=False)
            st8, s8 = step8(state_r, xb, yb, jax.random.PRNGKey(2))
            st8, s8b = step8(st8, xb, yb, jax.random.PRNGKey(4))
        np.testing.assert_allclose(float(s1['loss']), float(s8['loss']), rtol=2e-6)
        assert np.isfinite(float(s8b['loss']))
        assert step8._cache_size() == 1  # Steady state: no re-trace, no re-compile.


class TestAspectRatio:
    def test_output_shape_and_K(self):
        import random
        batch = make_batch(jax.random.PRNGKey(1))
        m = {}
        rng = random.Random(0)
        x, y, m = aspect_ratio_aug((batch[0], batch[1], m), p=1.0,
                                   ref_shape=(H, W), rng=rng)
        h2, w2 = x['imgs'].shape[1:3]
        assert h2 % 32 == 0 and w2 % 32 == 0
        assert h2 * w2 <= H * W
        assert x['supp_imgs'].shape[2:4] == (h2, w2)
        # K principal point stays centered for a centre crop + resize.
        np.testing.assert_allclose(np.asarray(y['K'][0, 0, 2]), w2 / 2, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(y['K'][0, 1, 2]), h2 / 2, rtol=1e-4)

    def test_identity_when_p0_and_no_ref(self):
        import random
        batch = make_batch(jax.random.PRNGKey(1))
        x, y, m = aspect_ratio_aug((batch[0], batch[1], {}), p=0.0, rng=random.Random(0))
        assert x['imgs'].shape == (B, H, W, 3)

    def test_crop_resize_matches_manual(self):
        """Fused crop+resize == exact centre crop + jax.image.resize."""
        import jax.image
        img = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 24, 3))
        from slowtv_monodepth_tpu.core import crop_resize
        out = crop_resize(img, jnp.array([8.0, 12.0]), (8, 12))
        manual = img[:, 4:12, 6:18]
        np.testing.assert_allclose(np.asarray(out), np.asarray(manual), atol=1e-5)


class TestPrecision:
    def test_bf16_close_to_f32(self):
        """bf16 forward/backward trains and tracks the f32 loss closely."""
        batch = make_batch(jax.random.PRNGKey(1))
        losses = {}
        for prec in (32, 'bf16'):
            cfg = make_cfg(trainer={'min_depth': 0.1, 'max_depth': 100,
                                    'always_fwd_pose': False, 'precision': prec})
            trainer = MonoDepthTrainer(cfg)
            tx = parsers.make_optimizer(cfg)
            state = trainer.init_state(jax.random.PRNGKey(0), batch[0], (-1, 1), tx)
            step = make_train_step(trainer, (-1, 1), tx, donate=False)
            state, sc = step(state, batch[0], batch[1], jax.random.PRNGKey(2))
            losses[prec] = float(sc['loss'])
            # Master params stay f32 regardless of compute precision.
            assert all(v.dtype == jnp.float32 for v in
                       jax.tree_util.tree_leaves(state.params))
        assert np.isfinite(losses['bf16'])
        assert abs(losses['bf16'] - losses[32]) / abs(losses[32]) < 0.05

    def test_bf16_feat_recon_depth_encoder(self):
        """feat_recon WITHOUT an autoencoder under bf16: the support-encoder
        pass (`extract_features` -> `_apply(method=encoder)`) must share the
        step's precision — support features come back f32-typed (cast back
        from the bf16 pass) and the loss stays finite and close to f32."""
        batch = make_batch(jax.random.PRNGKey(4))
        losses = {}
        for prec in (32, 'bf16'):
            cfg = make_cfg(
                loss={'img_recon': {'weight': 1, 'use_min': False,
                                    'use_automask': False},
                      'feat_recon': {'weight': 0.1, 'loss_name': 'l1',
                                     'use_min': False, 'use_automask': False}},
                trainer={'min_depth': 0.1, 'max_depth': 100,
                         'always_fwd_pose': False, 'precision': prec})
            trainer = MonoDepthTrainer(cfg)
            tx = parsers.make_optimizer(cfg)
            state = trainer.init_state(jax.random.PRNGKey(0), batch[0], (-1, 1), tx)

            fwd, _ = trainer.forward(state.params, state.aux, batch[0], (-1, 1),
                                     train=True)
            feat, supp_feat = trainer.extract_features(
                fwd, batch[0], state.params, state.aux, train=True)
            assert all(f.dtype == jnp.float32 for f in supp_feat)

            step = make_train_step(trainer, (-1, 1), tx, donate=False)
            state, sc = step(state, batch[0], batch[1], jax.random.PRNGKey(2))
            losses[prec] = float(sc['loss'])
        assert np.isfinite(losses['bf16'])
        assert abs(losses['bf16'] - losses[32]) / abs(losses[32]) < 0.05

    def test_remat_matches(self):
        """Remat changes memory, not numerics: loss identical to baseline."""
        batch = make_batch(jax.random.PRNGKey(1))
        losses = {}
        for remat in (False, True):
            cfg = make_cfg(trainer={'min_depth': 0.1, 'max_depth': 100,
                                    'always_fwd_pose': False, 'remat': remat})
            trainer = MonoDepthTrainer(cfg)
            tx = parsers.make_optimizer(cfg)
            state = trainer.init_state(jax.random.PRNGKey(0), batch[0], (-1, 1), tx)
            step = make_train_step(trainer, (-1, 1), tx, donate=False)
            _, sc = step(state, batch[0], batch[1], jax.random.PRNGKey(2))
            losses[remat] = float(sc['loss'])
        np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


class TestGradAccumulation:
    def test_accum2_matches_real_double_batch(self):
        """The TPU recipe's SGD-identity claim (cfg/kbr/tpu.yaml): batch 2b
        in ONE step == batch b x accumulate 2 over the same images. Both
        average per-pixel losses, so mean_2b = mean of the two mean_b's and
        MultiSteps' averaged grads reproduce the big-batch grad exactly.

        ConvNeXt encoders (the KBR family): LayerNorm is batch-independent,
        which the identity requires — BatchNorm encoders legitimately differ
        (batch statistics over 2b vs two b's)."""
        cfg = make_cfg(
            net={'depth': {'enc_name': 'convnext_atto', 'pretrained': False,
                           'dec_name': 'monodepth', 'out_scales': [0, 1]},
                 'pose': {'enc_name': 'convnext_atto', 'pretrained': False}},
            # No automask: its PRNG tie-break noise draws differ between one
            # step and two micro-steps; everything else is deterministic.
            loss={'img_recon': {'weight': 1, 'use_min': True,
                                'use_automask': False},
                  'disp_smooth': {'weight': 0.001, 'use_edges': True}},
            trainer={'min_depth': 0.1, 'max_depth': 100,
                     'always_fwd_pose': False, 'matmul': 'highest'})

        x, y = make_batch(jax.random.PRNGKey(5), b=4)
        half = lambda d, s: {k: (v[:, s] if k == 'supp_imgs' else v[s])  # noqa: E731
                             for k, v in d.items()}

        # A: two micro-batches of 2 with accumulate=2.
        trainer = MonoDepthTrainer(cfg)
        tx_a = parsers.make_optimizer(cfg, accumulate=2)
        state_a = trainer.init_state(jax.random.PRNGKey(0), half(x, slice(0, 2)),
                                     (-1, 1), tx_a)
        step_a = make_train_step(trainer, (-1, 1), tx_a, donate=False)
        rng = jax.random.PRNGKey(9)
        state_a, _ = step_a(state_a, half(x, slice(0, 2)), half(y, slice(0, 2)), rng)
        state_a, _ = step_a(state_a, half(x, slice(2, 4)), half(y, slice(2, 4)), rng)

        # B: the full batch of 4 in one real step.
        tx_b = parsers.make_optimizer(cfg, accumulate=1)
        state_b = trainer.init_state(jax.random.PRNGKey(0), x, (-1, 1), tx_b)
        step_b = make_train_step(trainer, (-1, 1), tx_b, donate=False)
        state_b, _ = step_b(state_b, x, y, rng)

        # atol: f32 reassociation noise — grads over (2b,...) vs two (b,...)
        # layouts reduce in different orders (observed ~8e-7 historically;
        # 3.5e-6 on one element of 60k after the r05 torch-exact resize
        # changed the smoothness-gradient fusion order).
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                    rtol=2e-5, atol=6e-6),
            state_a.params, state_b.params)
