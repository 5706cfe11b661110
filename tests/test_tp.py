"""Tensor-parallel sharding tests (`parallel/tp.py`) on the 8-device CPU mesh.

The reference serves its DPT baselines single-GPU (`src/core/predictors.py:
212-284`); tensor parallelism is a beyond-reference scale-out option, so the
bar is exactness: a (data x model) mesh must reproduce the replicated forward
bit-for-float-noise while the attention/MLP weights are genuinely sharded
(1/N addressable shards), and any head count / mesh combination must still
run (indivisible leaves fall back to replication).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from slowtv_monodepth_tpu.core.predictors import MonoDepthPredictor
from slowtv_monodepth_tpu.models.encoders.beit import BeitEncoder
from slowtv_monodepth_tpu.models.encoders.vit import ViTEncoder
from slowtv_monodepth_tpu.parallel import (
    make_mesh, shard_batch, shard_variables_tp, tp_leaf_spec, tp_shardings,
)


def _mesh2d(data=2, model=4):
    return make_mesh((data, model), ('data', 'model'))


def _tiny_vit(heads=4, dim=64):
    return ViTEncoder(dim=dim, depth=2, heads=heads, hooks=(0, 1),
                      channels=(8, 8), readout='project')


def _imgs(b=4, h=32, w=48):
    rng = np.random.default_rng(0)
    return rng.random((b, h, w, 3), dtype=np.float32)


def _assert_feats_match(out, ref, tol=2e-5):
    assert len(out) == len(ref)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=tol, atol=tol)


def _shard_shape(tree_leaf):
    return tree_leaf.addressable_shards[0].data.shape


class TestTpSpecs:
    def test_vit_attention_and_mlp_specs(self):
        net = _tiny_vit()
        params = net.init(jax.random.PRNGKey(0), jnp.asarray(_imgs(1)))
        mesh = _mesh2d()
        sh = tp_shardings(mesh, params)
        blk = sh['params']['block0']
        assert blk['attn']['query']['kernel'].spec == P(None, 'model', None)
        assert blk['attn']['query']['bias'].spec == P('model', None)
        assert blk['attn']['out']['kernel'].spec == P('model', None, None)
        assert blk['attn']['out']['bias'].spec == P()
        assert blk['mlp']['fc1']['kernel'].spec == P(None, 'model')
        assert blk['mlp']['fc1']['bias'].spec == P('model')
        assert blk['mlp']['fc2']['kernel'].spec == P('model', None)
        assert blk['mlp']['fc2']['bias'].spec == P()
        # Non-trunk leaves replicate.
        assert sh['params']['patch_embed']['kernel'].spec == P()

    def test_indivisible_dims_replicate(self):
        # heads=3 over a 4-way model axis: q/k/v kernels must fall back.
        spec = tp_leaf_spec(
            (jax.tree_util.DictKey('params'), jax.tree_util.DictKey('block0'),
             jax.tree_util.DictKey('attn'), jax.tree_util.DictKey('query'),
             jax.tree_util.DictKey('kernel')),
            jnp.zeros((48, 3, 16)), n=4)
        assert spec == P()

    def test_non_param_collections_replicate(self):
        spec = tp_leaf_spec(
            (jax.tree_util.DictKey('batch_stats'), jax.tree_util.DictKey('x'),
             jax.tree_util.DictKey('mean')), jnp.zeros((256,)), n=4)
        assert spec == P()


class TestTpForward:
    def test_vit_tp_matches_replicated(self):
        net = _tiny_vit()
        imgs = _imgs()
        x = jnp.asarray(imgs)
        params = net.init(jax.random.PRNGKey(0), x)
        ref = net.apply(params, x)

        mesh = _mesh2d()
        pv = shard_variables_tp(mesh, params)
        # The weights are genuinely sharded: 1/4 heads / hidden per shard.
        q = pv['params']['block0']['attn']['query']['kernel']
        assert _shard_shape(q) == (64, 1, 16)
        fc1 = pv['params']['block0']['mlp']['fc1']['kernel']
        assert _shard_shape(fc1) == (64, 64)

        out = jax.jit(lambda v, x: net.apply(v, x))(pv, shard_batch(mesh, imgs))
        _assert_feats_match(out, ref)

    def test_vit_tp_indivisible_heads_still_exact(self):
        net = _tiny_vit(heads=3, dim=48)
        imgs = _imgs()
        x = jnp.asarray(imgs)
        params = net.init(jax.random.PRNGKey(0), x)
        ref = net.apply(params, x)

        mesh = _mesh2d()
        pv = shard_variables_tp(mesh, params)
        q = pv['params']['block0']['attn']['query']['kernel']
        assert _shard_shape(q) == (48, 3, 16)  # replicated fallback
        fc1 = pv['params']['block0']['mlp']['fc1']['kernel']
        assert _shard_shape(fc1) == (48, 48)  # 192 hidden / 4

        out = jax.jit(lambda v, x: net.apply(v, x))(pv, shard_batch(mesh, imgs))
        _assert_feats_match(out, ref)

    def test_beit_tp_matches_replicated(self):
        net = BeitEncoder(dim=64, depth=2, heads=4, hooks=(0, 1),
                          channels=(8, 8), readout='project')
        imgs = _imgs()
        x = jnp.asarray(imgs)
        params = net.init(jax.random.PRNGKey(0), x)
        ref = net.apply(params, x)

        mesh = _mesh2d()
        pv = shard_variables_tp(mesh, params)
        blk = pv['params']['block0']
        assert _shard_shape(blk['attn']['qkv']['kernel']) == (64, 192)  # repl.
        assert _shard_shape(blk['attn']['proj']['kernel']) == (16, 64)  # rows
        assert _shard_shape(blk['mlp']['fc1']['kernel']) == (64, 64)

        out = jax.jit(lambda v, x: net.apply(v, x))(pv, shard_batch(mesh, imgs))
        _assert_feats_match(out, ref)


class TestPredictorTpMesh:
    def test_run_forward_on_2d_mesh_with_partial_batch(self):
        """The predictor runtime on a (data x model) mesh: weights tensor-
        shard, batches shard over `data` only, and a partial batch (3 over 2
        data shards) edge-pads + slices back to exact per-image outputs."""
        net = _tiny_vit()
        imgs = _imgs(b=3)
        params = net.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
        ref = net.apply(params, jnp.asarray(imgs))[0]

        class _P(MonoDepthPredictor):
            def load_model(self):
                raise NotImplementedError

        p = _P(mesh=_mesh2d())
        pv = p._place_variables(params)
        assert _shard_shape(
            pv['params']['block0']['mlp']['fc1']['kernel']) == (64, 64)
        fwd = jax.jit(lambda x: net.apply(pv, x)[0])
        out = p._run_forward(fwd, imgs)
        assert out.shape[0] == 3
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestMakeMeshNd:
    def test_tuple_shape_requires_axis_names(self):
        with pytest.raises(ValueError, match='axis name'):
            make_mesh((2, 4))

    def test_2d_mesh_shape(self):
        mesh = _mesh2d()
        assert mesh.shape == {'data': 2, 'model': 4}
        assert mesh.devices.shape == (2, 4)

    def test_1d_path_unchanged(self):
        mesh = make_mesh(8)
        assert mesh.shape == {'data': 8}
