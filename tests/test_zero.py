"""ZeRO state-sharding tests (`parallel/zero.py`) on the 8-device CPU mesh.

The reference trains with replicated-everything DDP (SURVEY.md §2.9); the
ZeRO stages are a beyond-reference scale-out option, so the bar is exactness:
stage 1 (sharded opt state) and stage 3 (sharded opt state + params) must
reproduce the replicated DP trajectory, while the committed state layout is
genuinely sharded (1/N addressable shards).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from slowtv_monodepth_tpu import parsers
from slowtv_monodepth_tpu.core import MonoDepthTrainer
from slowtv_monodepth_tpu.parallel import (
    make_mesh, make_train_step, shard_batch, shard_state, zero_leaf_spec,
)

B, H, W = 8, 32, 64
SUPP = (-1, 1)


def _cfg(opt=None):
    return {
        'net': {
            'depth': {'enc_name': 'toy', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': [0, 1]},
            'pose': {'enc_name': 'toy', 'pretrained': False, 'learn_K': True},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'optimizer': opt or {'type': 'adamw', 'lr': 1e-3,
                             'weight_decay': 1e-3, 'backbone_lr': 1e-4},
        'trainer': {'min_depth': 0.1, 'max_depth': 100, 'always_fwd_pose': False},
    }


def _batch():
    rng = np.random.default_rng(0)
    imgs = rng.random((B, H, W, 3), dtype=np.float32)
    supp = np.stack([np.roll(imgs, 2, axis=2), np.roll(imgs, -2, axis=2)])
    K = np.broadcast_to(np.array(
        [[0.5 * W, 0, 0.5 * W, 0], [0, 0.5 * H, 0.5 * H, 0],
         [0, 0, 1, 0], [0, 0, 0, 1.]], np.float32), (B, 4, 4))
    x = {'imgs': imgs, 'supp_imgs': supp}
    return x, {'imgs': imgs, 'supp_imgs': supp, 'K': K}


def _run(zero: int, n_steps: int = 3, opt=None):
    cfg = _cfg(opt)
    trainer = MonoDepthTrainer(cfg)
    tx = parsers.make_optimizer(cfg)
    x, y = _batch()
    mesh = make_mesh(8)
    losses = []
    with mesh:
        state = trainer.init_state(jax.random.PRNGKey(0), x, SUPP, tx)
        state = shard_state(mesh, state, zero)
        xb, yb = shard_batch(mesh, (x, y))
        step = make_train_step(trainer, SUPP, tx, mesh=mesh, donate=False,
                               zero=zero)
        for i in range(n_steps):
            state, scalars = step(state, xb, yb, jax.random.PRNGKey(i))
            losses.append(float(scalars['loss']))
    return state, losses


def test_zero_leaf_spec():
    assert zero_leaf_spec(jnp.zeros(()), 8, 'data') == P()
    assert zero_leaf_spec(jnp.zeros((5,)), 8, 'data') == P()          # Indivisible.
    assert zero_leaf_spec(jnp.zeros((16,)), 8, 'data') == P('data')
    # Largest divisible dim wins (dim 3), not the first (dim 2).
    assert zero_leaf_spec(jnp.zeros((7, 7, 8, 32)), 8, 'data') == \
        P(None, None, None, 'data')
    assert zero_leaf_spec(jnp.zeros((3, 5, 7)), 8, 'data') == P()


class TestZeroEquivalence:
    """Stage 1/3 must reproduce the replicated-DP trajectory.

    Two regimes, because the layouts change float summation order (grads
    arrive by reduce-scatter instead of all-reduce, convs partition over the
    sharded channel dim):

    - SGD+momentum: updates are LINEAR in the grads, so the trajectories
      track to float noise — tight per-param assertion.
    - adamw (the production recipe): m/(sqrt(v)+eps) amplifies noise
      unboundedly where grads are ~0, so exact per-param tracking is not a
      property even of two valid replicated runs. Assert the loss trajectory
      tightly and bound param drift by one LR step.
    """

    def _assert_params_close(self, a, b, rtol, atol):
        jax.tree_util.tree_map(
            lambda u, v: np.testing.assert_allclose(
                np.asarray(u), np.asarray(v), rtol=rtol, atol=atol),
            a, jax.device_get(b))

    SGD = {'type': 'sgd', 'lr': 1e-3, 'momentum': 0.9}

    def test_stage1_matches_replicated_sgd(self):
        s0, l0 = _run(zero=0, opt=self.SGD)
        s1, l1 = _run(zero=1, opt=self.SGD)
        np.testing.assert_allclose(l1, l0, rtol=1e-6)
        self._assert_params_close(s0.params, s1.params, rtol=1e-4, atol=1e-7)

    def test_stage3_matches_replicated_sgd(self):
        s0, l0 = _run(zero=0, opt=self.SGD)
        s3, l3 = _run(zero=3, opt=self.SGD)
        np.testing.assert_allclose(l3, l0, rtol=1e-6)
        self._assert_params_close(s0.params, s3.params, rtol=1e-4, atol=1e-7)

    def test_stage3_matches_replicated_adamw(self):
        s0, l0 = _run(zero=0)
        s3, l3 = _run(zero=3)
        np.testing.assert_allclose(l3, l0, rtol=1e-5)
        # One-LR-step bound (lr=1e-3): layout noise through adam cannot move
        # a param further than the update clamp itself.
        self._assert_params_close(s0.params, s3.params, rtol=2e-3, atol=1e-3)


class TestZeroLayout:
    def _sharded_frac(self, tree):
        """Fraction of tree bytes whose committed layout is sharded 1/8."""
        shard_bytes = total = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            n = leaf.size * leaf.dtype.itemsize
            total += n
            local = leaf.addressable_shards[0].data.size * leaf.dtype.itemsize
            if local * 8 == n:
                shard_bytes += n
        return shard_bytes / max(total, 1)

    def test_stage1_layout(self):
        state, _ = _run(zero=1, n_steps=1)
        # Params replicated; the bulk of the optimizer state sharded. The toy
        # nets have some tiny indivisible leaves (biases of width 12/24), so
        # assert on the byte fraction, not on every leaf.
        assert self._sharded_frac(state.params) == 0.0
        assert self._sharded_frac(state.opt_state) > 0.8

    def test_stage3_layout(self):
        state, _ = _run(zero=3, n_steps=1)
        assert self._sharded_frac(state.params) > 0.8
        assert self._sharded_frac(state.opt_state) > 0.8


def test_zero_checkpoint_roundtrip(tmp_path):
    """Sharded (zero=3) live state -> save -> restore into a sharded
    template: values equal, committed shard layout preserved."""
    from slowtv_monodepth_tpu.core.checkpoint import load_checkpoint, save_checkpoint

    state, _ = _run(zero=3, n_steps=1, opt={'type': 'sgd', 'lr': 1e-3,
                                            'momentum': 0.9})
    save_checkpoint(tmp_path / 'ck', state, {'cfg': 'x'}, epoch=0)

    restored, meta = load_checkpoint(tmp_path / 'ck', state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        jax.device_get(state.params), jax.device_get(restored.params))
    big = max(jax.tree_util.tree_leaves(restored.opt_state),
              key=lambda l: l.size)
    assert big.addressable_shards[0].data.size * 8 == big.size, \
        'restored opt state lost its sharding'
