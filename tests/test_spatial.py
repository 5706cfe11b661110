"""Spatial (height) sharding tests (`parallel/spatial.py`) on the CPU mesh.

The reference evaluates single-GPU and crops into a per-GPU pixel budget
(`src/core/aspect_ratio.py:36-64`); height-sharded inference is a
beyond-reference scale-out option, so the bar is exactness: a
(data x spatial) mesh must reproduce the replicated conv forward while the
image rows are genuinely sharded (XLA's SPMD partitioner materializes the
halo exchanges), and any height / mesh combination must still run
(indivisible heights fall back to replicated-H placement).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from slowtv_monodepth_tpu.core.predictors import (
    MonoDepthPredictor, arg_jitted_forward,
)
from slowtv_monodepth_tpu.models import DepthNet
from slowtv_monodepth_tpu.parallel import (
    make_mesh, shard_batch_spatial, spatial_image_spec,
)


def _mesh2d(data=2, spatial=4):
    return make_mesh((data, spatial), ('data', 'spatial'))


def _imgs(b=4, h=64, w=96):
    rng = np.random.default_rng(0)
    return rng.random((b, h, w, 3), dtype=np.float32)


class TestSpatialSpecs:
    def test_rank4_shards_batch_and_height(self):
        mesh = _mesh2d()
        spec = spatial_image_spec(jnp.zeros((4, 64, 96, 3)), mesh)
        assert spec == P('data', 'spatial', None, None)

    def test_rank5_support_stack_shards_dims_1_2(self):
        mesh = _mesh2d()
        spec = spatial_image_spec(jnp.zeros((2, 4, 64, 96, 3)), mesh)
        assert spec == P(None, 'data', 'spatial', None, None)

    def test_indivisible_height_leaves_h_replicated(self):
        mesh = _mesh2d()
        spec = spatial_image_spec(jnp.zeros((4, 62, 96, 3)), mesh)
        assert spec == P('data', None, None, None)

    def test_mesh_without_spatial_axis_reduces_to_batch_sharding(self):
        mesh = make_mesh(8)
        spec = spatial_image_spec(jnp.zeros((8, 64, 96, 3)), mesh)
        assert spec == P('data', None, None, None)

    def test_low_rank_leaves(self):
        mesh = _mesh2d()
        assert spatial_image_spec(jnp.zeros((4, 7)), mesh) == P('data')
        assert spatial_image_spec(jnp.zeros(()), mesh) == P()


class TestSpatialForward:
    def test_depthnet_spatial_matches_replicated(self):
        """Full conv depth net (strided convs, pooling, skip connections,
        nearest upsampling) over height shards: XLA's derived halo program
        must reproduce the single-device forward to float noise."""
        net = DepthNet(enc_name='resnet18', pretrained=False,
                       dec_name='monodepth', out_scales=(0,))
        imgs = _imgs()
        x = jnp.asarray(imgs)
        params = net.init(jax.random.PRNGKey(0), x, train=False)
        ref = net.apply(params, x, train=False)['disp'][0]

        mesh = _mesh2d()
        placed = shard_batch_spatial(mesh, imgs)
        # Rows are genuinely sharded: each device holds a (2, 16, 96, 3) tile.
        assert placed.addressable_shards[0].data.shape == (2, 16, 96, 3)

        out = jax.jit(
            lambda v, x: net.apply(v, x, train=False)['disp'][0])(params, placed)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_spatial_only_mesh(self):
        """An 8-way spatial-only mesh (batch replicated): the extreme case of
        serving one image too large for a chip."""
        net = DepthNet(enc_name='resnet18', pretrained=False,
                       dec_name='monodepth', out_scales=(0,))
        imgs = _imgs(b=1)
        x = jnp.asarray(imgs)
        params = net.init(jax.random.PRNGKey(0), x, train=False)
        ref = net.apply(params, x, train=False)['disp'][0]

        mesh = make_mesh((8,), ('spatial',))
        placed = shard_batch_spatial(mesh, imgs)
        assert placed.addressable_shards[0].data.shape == (1, 8, 96, 3)
        out = jax.jit(
            lambda v, x: net.apply(v, x, train=False)['disp'][0])(params, placed)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestSpatialTraining:
    def test_spatial_train_step_matches_single(self):
        """FULL train step (forward + multi-scale losses + view synthesis +
        grads + adamw) with image heights sharded over a (data=2 x spatial=4)
        mesh: loss and the stepped state must match the single-device run.
        The warp/photo Pallas kernels have no SPMD rule — `spatial=True` pins
        their exact XLA fallbacks, so the comparison is apples-to-apples."""
        from test_trainer import make_batch, make_cfg
        from slowtv_monodepth_tpu import parsers
        from slowtv_monodepth_tpu.core import MonoDepthTrainer
        from slowtv_monodepth_tpu.parallel import make_train_step

        cfg = make_cfg()
        batch = make_batch(jax.random.PRNGKey(1), b=2, h=64, w=96)
        trainer = MonoDepthTrainer(cfg)
        tx = parsers.make_optimizer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch[0], (-1, 1), tx)

        step1 = make_train_step(trainer, (-1, 1), tx, donate=False)
        _, s1 = step1(state, batch[0], batch[1], jax.random.PRNGKey(2))

        mesh = _mesh2d(data=2, spatial=4)
        with mesh:
            placed = tuple(shard_batch_spatial(mesh, part) for part in batch)
            # Image rows genuinely shard: (2, 64, ...) -> 1 x 16 per device.
            assert placed[0]['imgs'].addressable_shards[0].data.shape[:2] == (1, 16)
            step8 = make_train_step(trainer, (-1, 1), tx, mesh=mesh,
                                    donate=False, spatial=True)
            _, s8 = step8(state, placed[0], placed[1], jax.random.PRNGKey(2))
        np.testing.assert_allclose(float(s1['loss']), float(s8['loss']),
                                   rtol=1e-4)

    def test_spatial_requires_axis(self):
        from test_trainer import make_cfg
        from slowtv_monodepth_tpu import parsers
        from slowtv_monodepth_tpu.core import MonoDepthTrainer
        from slowtv_monodepth_tpu.parallel import make_train_step
        import pytest

        cfg = make_cfg()
        trainer = MonoDepthTrainer(cfg)
        tx = parsers.make_optimizer(cfg)
        with pytest.raises(ValueError, match='spatial'):
            make_train_step(trainer, (-1, 1), tx, mesh=make_mesh(8),
                            spatial=True)


class TestSpatialShardMapWarp:
    """`grid_sample` under `dispatch.spatial_warp_shardmap`: the shard_map
    wrapper that keeps the Pallas warp kernel alive per height shard in the
    spatial train step (the full XLA fallback costs 5.3x, STATUS round 4).
    Forward AND gradients must match the plain path exactly — including the
    source-image cotangent, whose per-shard contributions must psum over the
    spatial axis (every output shard reads the replicated full source)."""

    def _warp_args(self, b=4, h=32, w=48, c=3):
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.random((b, h, w, c), dtype=np.float32))
        grid = jnp.asarray(rng.uniform(-1.1, 1.1, (b, h, w, 2)).astype(np.float32))
        return img, grid

    def test_forward_and_grads_match_plain(self):
        from slowtv_monodepth_tpu.ops.dispatch import spatial_warp_shardmap
        from slowtv_monodepth_tpu.ops.sample import grid_sample

        img, grid = self._warp_args()
        cot = jnp.asarray(np.random.default_rng(5).random(img.shape[:1] + grid.shape[1:3] + img.shape[-1:], dtype=np.float32))

        def loss(im, g):
            return (grid_sample(im, g) * cot).sum()

        ref, (dimg_ref, dgrid_ref) = jax.value_and_grad(loss, argnums=(0, 1))(img, grid)

        mesh = _mesh2d(data=2, spatial=4)
        with spatial_warp_shardmap(mesh):
            out_sp = grid_sample(img, grid)
            got, (dimg, dgrid) = jax.jit(
                jax.value_and_grad(loss, argnums=(0, 1)))(img, grid)

        np.testing.assert_allclose(np.asarray(out_sp),
                                   np.asarray(grid_sample(img, grid)), atol=1e-6)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dimg), np.asarray(dimg_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(dgrid), np.asarray(dgrid_ref),
                                   atol=1e-4)

    def test_indivisible_shapes_fall_back(self):
        from slowtv_monodepth_tpu.ops.dispatch import spatial_warp_shardmap
        from slowtv_monodepth_tpu.ops.sample import grid_sample

        img, grid = self._warp_args(b=3, h=30, w=48)  # 30 % 4 != 0, 3 % 2 != 0.
        ref = grid_sample(img, grid)
        mesh = _mesh2d(data=2, spatial=4)
        with spatial_warp_shardmap(mesh):
            got = grid_sample(img, grid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def test_batch_reshard_path_matches_plain(self):
        """b divides n_data*n_spatial -> the memory-neutral batch-resharding
        partitioning (in_specs P((da, sa)), full height per image; the
        training case — the warp runs on the (n_supp x n_scales x b) flat
        stack). Forward and both gradients must match the plain path."""
        from slowtv_monodepth_tpu.ops.dispatch import spatial_warp_shardmap
        from slowtv_monodepth_tpu.ops.sample import grid_sample

        img, grid = self._warp_args(b=16)
        cot = jnp.asarray(np.random.default_rng(7).random(
            img.shape[:1] + grid.shape[1:3] + img.shape[-1:], dtype=np.float32))

        def loss(im, g):
            return (grid_sample(im, g) * cot).sum()

        ref, (dimg_ref, dgrid_ref) = jax.value_and_grad(
            loss, argnums=(0, 1))(img, grid)

        mesh = _mesh2d(data=2, spatial=4)
        with spatial_warp_shardmap(mesh):
            got, (dimg, dgrid) = jax.jit(
                jax.value_and_grad(loss, argnums=(0, 1)))(img, grid)

        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dimg), np.asarray(dimg_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(dgrid), np.asarray(dgrid_ref),
                                   atol=1e-4)


class TestSpatialShardMapPhoto:
    """Fused SSIM+L1 photo kernel under `dispatch.spatial_photo_shardmap`:
    the batch-resharding shard_map that keeps the Pallas kernel alive in the
    spatial train step (in_specs P((da, sa)), full height per image —
    memory-neutral, no psum in the backward). Forward and both gradients
    must match the plain kernel; the kernel itself runs in interpret mode on
    CPU (SLOWTV_FORCE_PALLAS_PHOTO)."""

    def _args(self, m=16, h=32, w=48, c=3):
        rng = np.random.default_rng(11)
        pred = jnp.asarray(rng.random((m, h, w, c), dtype=np.float32))
        tgt = jnp.asarray(rng.random((m, h, w, c), dtype=np.float32))
        cot = jnp.asarray(rng.random((m, h, w, 1), dtype=np.float32))
        return pred, tgt, cot

    def test_forward_and_grads_match_plain(self, monkeypatch):
        monkeypatch.setenv('SLOWTV_FORCE_PALLAS_PHOTO', '1')
        from slowtv_monodepth_tpu.losses.photometric import PhotoError
        from slowtv_monodepth_tpu.ops.dispatch import spatial_photo_shardmap

        pred, tgt, cot = self._args()
        err = PhotoError(0.85)
        assert err._fused_ok(pred), 'fused kernel not engaged'

        def loss(p, t):
            return (err(p, t) * cot).sum()

        ref, (dp_ref, dt_ref) = jax.value_and_grad(
            loss, argnums=(0, 1))(pred, tgt)

        mesh = _mesh2d(data=2, spatial=4)
        with spatial_photo_shardmap(mesh):
            assert err._fused_ok(pred)
            got, (dp, dt) = jax.jit(
                jax.value_and_grad(loss, argnums=(0, 1)))(pred, tgt)

        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(dt), np.asarray(dt_ref),
                                   atol=1e-5)

    def test_indivisible_batch_gates_fused_off(self, monkeypatch):
        """m % (n_d*n_s) != 0 -> `_fused_ok` returns False under the spatial
        context (the XLA path, which GSPMD partitions with halos, runs
        instead) and the op stays exact."""
        monkeypatch.setenv('SLOWTV_FORCE_PALLAS_PHOTO', '1')
        from slowtv_monodepth_tpu.losses.photometric import PhotoError
        from slowtv_monodepth_tpu.ops.dispatch import spatial_photo_shardmap

        pred, tgt, _ = self._args(m=6)
        err = PhotoError(0.85)
        ref = err(pred, tgt)
        mesh = _mesh2d(data=2, spatial=4)
        with spatial_photo_shardmap(mesh):
            assert not err._fused_ok(pred)
            got = err(pred, tgt)
        # Kernel-vs-XLA parity bound (matches tests/test_pallas_photo.py).
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


class TestPredictorSpatialMesh:
    def test_run_forward_partial_batch(self):
        """Predictor runtime on a (data x spatial) mesh: batches pad to the
        data axis only (3 images over 2 data shards -> pad to 4), heights
        shard, outputs slice back exactly.

        Uses the production `arg_jitted_forward` wrapper: variables must ride
        as jit ARGUMENTS — closed-over variables become SPMD compile-time
        constants and the partitioned forward drifts ~2e-2 on this random-init
        net (uniform fp reassociation amplified through depth, not a halo
        artifact; pinned here at 2e-5 with the argument path).
        """
        net = DepthNet(enc_name='resnet18', pretrained=False,
                       dec_name='monodepth', out_scales=(0,))
        imgs = _imgs(b=3)
        params = net.init(jax.random.PRNGKey(0), jnp.asarray(imgs), train=False)
        ref = net.apply(params, jnp.asarray(imgs), train=False)['disp'][0]

        class _P(MonoDepthPredictor):
            def load_model(self):
                raise NotImplementedError

        p = _P(mesh=_mesh2d())
        assert p._data_shards == 2
        base = arg_jitted_forward(net, params)
        fwd = lambda x: base(x)['disp'][0]  # noqa: E731
        out = p._run_forward(fwd, imgs)
        assert out.shape[0] == 3
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_spatial_only_mesh_no_batch_padding(self):
        class _P(MonoDepthPredictor):
            def load_model(self):
                raise NotImplementedError

        p = _P(mesh=make_mesh((8,), ('spatial',)))
        assert p._batch_axis is None
        assert p._data_shards == 1


class TestSpatialLoop:
    def test_fit_on_spatial_mesh(self, tmp_path):
        """Full `MonoDepthLoop.fit` (real SlowTV-style loader, AR-aug shapes,
        ckpt/markers) on a (data=2 x spatial=2) mesh: the loop detects the
        spatial axis from the mesh, height-shards every batch, and trains."""
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent))
        from test_loop import make_cfg as make_loop_cfg

        from slowtv_monodepth_tpu import paths
        from slowtv_monodepth_tpu.core import MonoDepthLoop

        # Tiny SlowTV tree (test_loop's fixture, inlined — fixture fns are
        # not callable across modules).
        from PIL import Image
        root = tmp_path / 'slow_tv'
        seq = '00001'
        for stem in range(8):
            p = root / seq / f'{stem:010}.png'
            p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(np.random.default_rng(stem).integers(
                0, 255, (48, 64, 3), dtype=np.uint8)).save(p)
        np.savetxt(root / seq / 'intrinsics.txt',
                   np.array([[600, 0, 640, 0], [0, 600, 360, 0],
                             [0, 0, 1, 0], [0, 0, 0, 1.0]]))
        (root / 'splits' / 'all').mkdir(parents=True)
        (root / 'splits' / 'all' / 'train_files.txt').write_text(
            '\n'.join(f'{seq} {i}' for i in range(2, 6)))
        (root / 'splits' / 'all' / 'val_files.txt').write_text(
            '\n'.join(f'{seq} {i}' for i in range(6, 8)))
        (root / 'splits' / 'categories.txt').write_text('natural-hiking\n')
        paths.DATA_PATHS['slow_tv'] = root
        try:
            cfg = make_loop_cfg()
            cfg['trainer']['max_epochs'] = 1
            cfg['dataset']['slow_tv']['train']['use_aug'] = False  # one shape
            mesh = make_mesh((2, 2), ('data', 'spatial'))
            loop = MonoDepthLoop(cfg, ckpt_dir=tmp_path / 'models', mesh=mesh)
            assert loop.spatial
            loop.fit()
            assert (tmp_path / 'models' / 'last').exists()
        finally:
            paths.DATA_PATHS.pop('slow_tv', None)
