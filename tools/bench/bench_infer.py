"""Inference (serving) throughput of the flagship depth net on the real chip.

The training step is covered by `bench.py`; this measures the eval-side
forward that `export_preds` / `quickstart` drive (ref
`src/core/predictors.py:116-147`): DepthNet ConvNeXt-B + Monodepth decoder at
the KITTI/SYNS eval shape (batch 12 @ 192x640, the `export_preds` default),
sigmoid-disparity output fetched to host per batch.

Variants:
- `exact-f32`: the bit-faithful eval recipe imported reference checkpoints
  run under (reflect decoder pad, exact GELU, f32).
- `tpu-bf16`: the tpu.yaml training flavor (tanh GELU, zero pad, bf16 fwd).
- `*-blend`: + horizontal-flip stereo blending (2 forwards + merge, ref
  `predictors.py:93-94` semantics) as used by the benchmark eval recipes.

Same-process interleaved timing, best-of-rounds (cross-session wall clock
drifts ~15% on the axon tunnel — see STATUS.md measurement lessons).

Sharded serving characterization (VERDICT r04 item 7): any of
`--devices N --model-shards M --spatial-shards S` switches to the
mesh-partitioned export forward (exactly `core/predictors.py`'s placement)
and reports per-device FLOPs/bytes + the collective mix — on the virtual
CPU mesh as op/HLO evidence, on real multi-chip hardware with wall imgs/s.
See STATUS.md round 5 for the recorded table.

Usage:
    python tools/bench/bench_infer.py [--batch 12] [--iters 20] [--rounds 3]
    python tools/bench/bench_infer.py --devices 4 --spatial-shards 2
    python tools/bench/bench_infer.py --devices 2 --model-shards 4 --flavor dpt-vit
"""
from __future__ import annotations

import sys
import time
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

from slowtv_monodepth_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache('bench')
import jax.numpy as jnp

H, W = 192, 640


def build(batch: int, flavor: str, blend: bool):
    from slowtv_monodepth_tpu.models import DepthNet
    from slowtv_monodepth_tpu.ops import blend_stereo

    kw = dict(enc_name='convnext_base', pretrained=False,
              dec_name='monodepth', out_scales=(0, 1, 2, 3))
    if flavor == 'tpu-bf16':
        kw.update(gelu='tanh', dec_pad_mode='zeros')
    net = DepthNet(**kw)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (batch, H, W, 3))
    variables = net.init(jax.random.PRNGKey(1), imgs, train=False)
    if flavor == 'tpu-bf16':
        variables = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
            variables)
        imgs = imgs.astype(jnp.bfloat16)

    def fwd(v, x):
        d = net.apply(v, x, train=False)['disp'][0].astype(jnp.float32)
        if blend:
            df = net.apply(v, x[:, :, ::-1], train=False)['disp'][0]
            d = blend_stereo(d, df[:, :, ::-1].astype(jnp.float32))
        return d

    compiled = jax.jit(fwd).lower(variables, imgs).compile()
    return compiled, variables, imgs


def timed(compiled, variables, imgs, iters: int) -> float:
    """Pipelined honest host-fetch timing (bench.py pattern)."""
    out = None
    for _ in range(3):
        out = compiled(variables, imgs)
    float(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        out = compiled(variables, imgs)
        if prev is not None:
            float(prev[0, 0, 0, 0])
        prev = out
    float(prev[0, 0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1000


def bench_sharded(batch: int, flavor: str, data: int, model: int,
                  spatial: int, platform: str, iters: int) -> None:
    """Characterize the sharded serving paths (VERDICT r04 item 7).

    Builds the eval forward over a (data x model x spatial) mesh exactly as
    `core/predictors.py` does for `export_preds --devices/--model-shards/
    --spatial-shards`, then reports the compiled program's cost story:
    per-device FLOPs, collective mix (all-gathers from TP weight shards,
    halo exchanges from spatial height shards), and — when the mesh devices
    are real — wall imgs/s. On the virtual CPU mesh the wall number is
    explicitly labeled non-comparable; the HLO/op evidence is the product.
    """
    import re

    import numpy as np

    from slowtv_monodepth_tpu.models import DepthNet
    from slowtv_monodepth_tpu.parallel import (make_mesh, replicated,
                                               shard_batch_spatial,
                                               shard_variables_tp)

    n_dev = data * model * spatial
    if platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_num_cpu_devices', max(
            n_dev, len(jax.devices()) if False else n_dev))
    axes, sizes = [], []
    for name, size in (('data', data), ('model', model), ('spatial', spatial)):
        if size > 1 or name == 'data':
            axes.append(name)
            sizes.append(size)
    mesh = make_mesh(tuple(sizes), tuple(axes),
                     platform='cpu' if platform == 'cpu' else None)

    # TP (`--model-shards`) is Megatron-style over TRANSFORMER trunks
    # (`parallel/tp.py` shards attn/mlp dense kernels; convnets replicate
    # and a model axis buys nothing) — so the TP rows use the quickstart
    # DPT ViT trunk, the serving model TP exists for.
    h, w = (H, W) if flavor != 'dpt-vit' else (384, 384)
    if flavor == 'dpt-vit':
        kw = dict(enc_name='vitb16_384', pretrained=False, dec_name='dpt',
                  out_scales=(0,))
    else:
        kw = dict(enc_name='convnext_base', pretrained=False,
                  dec_name='monodepth', out_scales=(0, 1, 2, 3))
        if flavor == 'tpu-bf16':
            kw.update(gelu='tanh', dec_pad_mode='zeros')
    net = DepthNet(**kw)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((batch, h, w, 3), np.float32))
    with mesh, jax.default_device(mesh.devices.flat[0]):
        variables = net.init(jax.random.PRNGKey(1), imgs, train=False)
        if flavor == 'tpu-bf16':
            variables = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
                variables)
            imgs = imgs.astype(jnp.bfloat16)
        if 'model' in mesh.axis_names and mesh.shape['model'] > 1:
            variables = shard_variables_tp(mesh, variables)
        else:
            variables = jax.device_put(variables, replicated(mesh))
        placed = shard_batch_spatial(mesh, imgs, data_axis='data')

        def fwd(v, x):
            return net.apply(v, x, train=False)['disp'][0].astype(jnp.float32)

        compiled = jax.jit(fwd).lower(variables, placed).compile()
        hlo = compiled.as_text()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else (ca or {})
        colls = {fam: len(re.findall(rf'\b{fam}(?:-start)?\(', hlo))
                 for fam in ('all-reduce', 'all-gather', 'reduce-scatter',
                             'collective-permute', 'all-to-all')}
        flops = float(ca.get('flops', 0.0))
        bytes_ = float(ca.get('bytes accessed', 0.0))
        label = f'd{data}xm{model}xs{spatial}'
        real = platform != 'cpu'
        line = (f'sharded[{label}] {flavor}: flops/device '
                f'{flops / 1e9:.2f} GF, bytes/device {bytes_ / 1e6:.1f} MB, '
                f'collectives {dict((k, v) for k, v in colls.items() if v)}')
        if real:
            ms = timed(compiled, variables, placed, iters)
            line += f', {ms:.1f} ms/batch{batch} = {batch / ms * 1000:.1f} imgs/s'
        else:
            out = compiled(variables, placed)
            assert out.shape[0] == batch, out.shape
            line += ' (virtual CPU mesh: op evidence only, wall time not comparable)'
        print(line)


def main():
    ap = ArgumentParser()
    ap.add_argument('--batch', type=int, default=12)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--rounds', type=int, default=3)
    ap.add_argument('--blend', action='store_true',
                    help='also time flip-blend variants')
    ap.add_argument('--devices', type=int, default=0,
                    help='Sharded mode: data-parallel shard count.')
    ap.add_argument('--model-shards', type=int, default=1,
                    help='Sharded mode: tensor-parallel weight shards '
                         '(parallel/tp.py).')
    ap.add_argument('--spatial-shards', type=int, default=1,
                    help='Sharded mode: image-height shards '
                         '(parallel/spatial.py).')
    ap.add_argument('--platform', default='cpu', choices=('cpu', 'default'),
                    help='Sharded mode backend: virtual CPU mesh (op/HLO '
                         'evidence) or the default backend (real chips).')
    ap.add_argument('--flavor', default='tpu-bf16',
                    choices=('exact-f32', 'tpu-bf16', 'dpt-vit'),
                    help='Sharded mode network flavor.')
    args = ap.parse_args()

    if args.devices or args.model_shards > 1 or args.spatial_shards > 1:
        bench_sharded(args.batch, args.flavor, max(args.devices, 1),
                      args.model_shards, args.spatial_shards, args.platform,
                      args.iters)
        return

    specs = [('exact-f32', False), ('tpu-bf16', False)]
    if args.blend:
        specs += [('exact-f32-blend', True), ('tpu-bf16-blend', True)]

    variants = {}
    for name, blend in specs:
        flavor = name.replace('-blend', '')
        variants[name] = build(args.batch, flavor, blend)

    best = {k: float('inf') for k in variants}
    for _ in range(args.rounds):
        for key, v in variants.items():
            best[key] = min(best[key], timed(*v, args.iters))

    for key, ms in best.items():
        print(f'{key}: {ms:.1f} ms/batch{args.batch} '
              f'= {args.batch / ms * 1000:.1f} imgs/s')


if __name__ == '__main__':
    main()
