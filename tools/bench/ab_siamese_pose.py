"""A/B: shared-trunk Siamese pose encoder vs the reference pair-stacking
(VERDICT r04 item 4b).

The reference PoseNet (ref `src/networks/pose.py:27-58`) channel-concats
each (support, target) frame pair into ONE 6-channel input, so the encoder
runs 2 pair-passes per sample — and frame t appears in both pairs. The
Siamese idea: encode each FRAME once through a shared 3-channel trunk and
fuse per-pair at the feature level, de-duplicating frame t.

Arithmetic first (this is why the idea loses): a ConvNeXt trunk's cost is
set by its post-stem body, which is CHANNEL-COUNT-INVARIANT to the input
(in_chans only affects the 4x4 stem projection, <1% of FLOPs). So:

- pair-stacking: 2 body passes / sample  (the 6-ch pair costs the same as a
  3-ch frame after the stem)
- Siamese:       3 body passes / sample  (frames t-1, t, t+1 each encoded)

= the Siamese trunk does 1.5x the work; de-duplicating frame t saves one
stem but adds a whole body pass. It would only win if pose pairs shared
MORE than one frame (n_supp > 2 chains, where 2k pair-passes vs k+1 frame
passes crosses over at k >= 2... i.e. never for the KBR recipe's 2 pairs).

This tool makes the record executable: it builds both variants, compares
XLA cost-model FLOPs of the jitted fwd+bwd, and (on a real chip) times them
same-process interleaved. Expected and recorded outcome: LOSS.

Usage: python tools/bench/ab_siamese_pose.py [--batch 8] [--wall]
"""
from __future__ import annotations

import sys
import time
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slowtv_monodepth_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache('bench')

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class SiamesePose(nn.Module):
    """Shared-trunk variant: per-FRAME encoder + pair-level feature fusion.

    Not registered and not a recipe option — it exists to measure the
    VERDICT r04 4b hypothesis. A real adoption would also need endpoint
    qualification like `input_scale` (tests/test_recipe_deviation.py).
    """
    enc_name: str = 'convnext_tiny'
    gelu: str = 'tanh'

    def setup(self):
        from slowtv_monodepth_tpu.models.encoders import create_encoder
        self.encoder, self.n_ch_enc, _ = create_encoder(
            self.enc_name, in_chans=3, gelu=self.gelu)
        self.squeeze = nn.Conv(256, (1, 1), name='squeeze')
        self.head = nn.Conv(12, (1, 1), name='head')

    def __call__(self, frames, train=False):
        """:param frames: (3, b, h, w, 3) unique frames [t-1, t, t+1]."""
        n, b = frames.shape[:2]
        flat = frames.reshape((n * b,) + frames.shape[2:])
        feat = self.encoder(flat, train=train)[-1]
        feat = feat.reshape((n, b) + feat.shape[1:])
        # Pairs (t-1, t) and (t, t+1): concat features channel-wise.
        pairs = jnp.concatenate([
            jnp.concatenate([feat[0], feat[1]], axis=-1),
            jnp.concatenate([feat[1], feat[2]], axis=-1)], axis=0)
        out = self.head(nn.relu(self.squeeze(pairs)))
        return 0.01 * out.mean(axis=(1, 2))


def main():
    ap = ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--wall', action='store_true',
                    help='also wall-time both variants (real chip)')
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--rounds', type=int, default=3)
    args = ap.parse_args()

    from slowtv_monodepth_tpu.models import PoseNet

    B, H, W = args.batch, 384, 640
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (B, H, W, 3), jnp.bfloat16)
    prev_ = jnp.roll(imgs, 2, axis=2)
    next_ = jnp.roll(imgs, -2, axis=2)

    # --- A: reference pair-stacking (2 pair-passes of 6-ch inputs).
    pose = PoseNet(enc_name='convnext_tiny', learn_K=True, gelu='tanh')
    pairs = jnp.concatenate([
        jnp.concatenate([prev_, imgs], axis=-1),
        jnp.concatenate([imgs, next_], axis=-1)], axis=0)
    vars_a = pose.init(jax.random.PRNGKey(1), pairs, train=True)

    def loss_a(v, x):
        out = pose.apply(v, x, train=True)
        return (out['R'] ** 2 + out['t'] ** 2).sum().astype(jnp.float32)

    # --- B: Siamese shared trunk (3 frame-passes of 3-ch inputs).
    siam = SiamesePose()
    frames = jnp.stack([prev_, imgs, next_])
    vars_b = siam.init(jax.random.PRNGKey(1), frames, train=True)

    def loss_b(v, x):
        return (siam.apply(v, x, train=True) ** 2).sum().astype(jnp.float32)

    results = {}
    for name, fn, v, x in (('pair-stack', loss_a, vars_a, pairs),
                           ('siamese', loss_b, vars_b, frames)):
        grad = jax.jit(jax.grad(fn))
        compiled = grad.lower(v, x).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else (ca or {})
        flops = float(ca.get('flops', 0))
        results[name] = (flops, compiled, v, x)
        print(f'{name:10s}: fwd+bwd {flops / 1e9:8.1f} GFLOP '
              f'({flops / 1e9 / B:6.1f}/img)')
    ratio = results['siamese'][0] / results['pair-stack'][0]
    print(f'siamese / pair-stack FLOP ratio: {ratio:.3f} '
          f'({"LOSS" if ratio > 1 else "win"} — the trunk runs 3 frame '
          f'passes vs 2 pair passes)')

    if args.wall:
        dts = {k: float('inf') for k in results}
        for _ in range(args.rounds):
            for name, (_, compiled, v, x) in results.items():
                g = compiled(v, x)
                jax.tree_util.tree_leaves(g)[0].block_until_ready()
                t0 = time.perf_counter()
                prev = None
                for _ in range(args.iters):
                    g = compiled(v, x)
                    leaf = jax.tree_util.tree_leaves(g)[0]
                    if prev is not None:
                        float(prev.reshape(-1)[0])
                    prev = leaf
                float(prev.reshape(-1)[0])
                dts[name] = min(dts[name], time.perf_counter() - t0)
        for name, dt in dts.items():
            print(f'{name:10s}: {1000 * dt / args.iters:7.2f} ms/step')


if __name__ == '__main__':
    main()
