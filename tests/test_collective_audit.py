"""First-class collective audits of the three sharded-step layouts
(VERDICT r04 item 6).

The sharding design derives every collective from layout annotations
(SURVEY.md §2.9): the compiled programs — not just their losses — are part
of the contract. These tests compile the KBR step at dry-run scale on the
8-device CPU mesh and inspect the optimized HLO:

- DP:      gradient all-reduce present; params/opt never reduce-scattered
           and never gathered at per-parameter scale (only the small
           batch-reshard collectives the handlers' (n_supp, b) flattening
           legitimately needs).
- ZeRO-3:  on-use param all-gathers dominate (the FSDP signature) and a
           cross-device grad reduction exists (reduce-scatter, or the CPU
           backend's all-reduce + sharded-slice decomposition of it).
- spatial: halo exchanges present (collective-permute, XLA's conv-overlap
           exchange) AND the SPMD partitioner never hits its
           "Involuntary full rematerialization" fallback (r03/r04 weak
           items; the fix is `ops/dispatch.constrain_spatial` applied in
           DepthNet, PoseNet and AutoencoderNet).

A layout regression now fails a named test instead of surfacing as a
driver-log warning nobody re-reads (`MULTICHIP_r0N.json` tails).
"""
import os
import re
import tempfile
from contextlib import contextmanager

import jax
import numpy as np
import pytest

from slowtv_monodepth_tpu import parsers
from slowtv_monodepth_tpu.core import MonoDepthTrainer
from slowtv_monodepth_tpu.parallel import (make_mesh, make_train_step,
                                           shard_batch, shard_batch_spatial)
from slowtv_monodepth_tpu.parallel.zero import shard_state

CFG = {
    'net': {
        'depth': {'enc_name': 'toy', 'pretrained': False,
                  'dec_name': 'monodepth', 'out_scales': (0, 1, 2, 3)},
        'pose': {'enc_name': 'toy', 'pretrained': False, 'learn_K': True},
    },
    'loss': {
        'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
        'disp_smooth': {'weight': 0.001, 'use_edges': True},
    },
    'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3,
                  'backbone_lr': 1e-5},
    'scheduler': {'steplr': {'step_size': 40, 'gamma': 0.1}},
    'trainer': {'min_depth': 0.1, 'max_depth': 100, 'always_fwd_pose': False},
}
SUPP = (-1, 1)
B, H, W = 8, 32, 64

# Collective families as they appear in optimized HLO (sync or async-pair
# form, e.g. `all-reduce` / `all-reduce-start`).
FAMILIES = ('all-reduce', 'reduce-scatter', 'all-gather',
            'collective-permute', 'all-to-all')


def _collective_counts(hlo: str) -> dict:
    return {fam: len(re.findall(rf'\b{fam}(?:-start)?\(', hlo))
            for fam in FAMILIES}


@contextmanager
def _capture_stderr_fd():
    """OS-level fd-2 capture: the SPMD partitioner warns from C++ (absl),
    which python-level redirection cannot see."""
    with tempfile.TemporaryFile(mode='w+b') as f:
        old = os.dup(2)
        os.dup2(f.fileno(), 2)
        out = {}
        try:
            yield out
        finally:
            os.dup2(old, 2)
            os.close(old)
            f.seek(0)
            out['text'] = f.read().decode(errors='replace')


def _batch():
    rng = np.random.default_rng(0)
    imgs = rng.random((B, H, W, 3), dtype=np.float32)
    supp = np.stack([np.roll(imgs, 1, axis=2), np.roll(imgs, -1, axis=2)])
    K = np.broadcast_to(np.array(
        [[0.6 * W, 0, 0.5 * W, 0], [0, 0.6 * H, 0.5 * H, 0],
         [0, 0, 1, 0], [0, 0, 0, 1.0]], np.float32), (B, 4, 4))
    x = {'imgs': imgs, 'supp_imgs': supp}
    return x, {**x, 'K': K}


@pytest.fixture(scope='module')
def setup():
    trainer = MonoDepthTrainer(CFG)
    tx = parsers.make_optimizer(CFG, steps_per_epoch=100)
    x, y = _batch()
    state = trainer.init_state(jax.random.PRNGKey(1), x, SUPP, tx)
    return trainer, tx, x, y, state


@pytest.fixture(scope='module')
def dp_counts(setup):
    trainer, tx, x, y, state = setup
    mesh = make_mesh(8)
    xb, yb = shard_batch(mesh, (x, y))
    step = make_train_step(trainer, SUPP, tx, mesh=mesh, donate=False)
    hlo = step.lower(state, xb, yb, jax.random.PRNGKey(2)).compile().as_text()
    return _collective_counts(hlo)


@pytest.mark.slow
def test_dp_collectives(dp_counts):
    """DP: gradient all-reduce present; NO ZeRO-style collectives.

    The batch-sharded program legitimately carries a handful of small
    batch-RESHARD collectives (the handlers flatten (n_supp, b) stacks for
    the single batched view-synth, which moves the sharded dim — an
    all-to-all/permute on activations), so the audit pins what
    distinguishes the LAYOUT: grads are all-reduced, params/opt are never
    scattered (no reduce-scatter) and never gathered en masse (all-gather
    stays far below the ZeRO-3 program's per-parameter gathers, measured
    60 there vs 4 here).
    """
    n = dp_counts
    assert n['all-reduce'] >= 1, n
    assert n['reduce-scatter'] == 0, f'ZeRO-style grad scatter under DP: {n}'
    assert n['all-gather'] <= 10, f'param-gather-scale all-gathers under DP: {n}'


@pytest.mark.slow
def test_zero3_collectives(setup, dp_counts):
    """ZeRO-3: on-use param all-gathers dominate; grad reduction present.

    The param gathers are the signature (one per layer-use, ~60 at this
    depth vs <=4 in the DP program). The grad reduction may compile as
    reduce-scatter OR as all-reduce feeding sharded update slices — the
    CPU backend takes the latter form (the partitioner decomposes
    reduce-scatter when it prefers; memory-equivalent after fusion) — so
    the audit accepts either, but requires SOME cross-device grad
    reduction plus the gather signature.
    """
    trainer, tx, x, y, state = setup
    mesh = make_mesh(8)
    xb, yb = shard_batch(mesh, (x, y))
    state3 = shard_state(mesh, state, zero=3)
    step3 = make_train_step(trainer, SUPP, tx, mesh=mesh, donate=False, zero=3)
    hlo = step3.lower(state3, xb, yb, jax.random.PRNGKey(2)).compile().as_text()
    n = _collective_counts(hlo)
    assert n['reduce-scatter'] + n['all-reduce'] >= 1, f'no grad reduction: {n}'
    assert n['all-gather'] >= 5 * max(dp_counts['all-gather'], 1), (
        f'missing on-use param all-gathers: zero3={n} dp={dp_counts}')


@pytest.mark.slow
def test_spatial_collectives_and_no_full_remat(setup):
    trainer, tx, x, y, state = setup
    mesh_sp = make_mesh((4, 2), ('data', 'spatial'))
    xs, ys = (shard_batch_spatial(mesh_sp, t) for t in (x, y))
    step_sp = make_train_step(trainer, SUPP, tx, mesh=mesh_sp,
                              donate=False, spatial=True)
    with _capture_stderr_fd() as cap:
        hlo = step_sp.lower(state, xs, ys,
                            jax.random.PRNGKey(2)).compile().as_text()
    n = _collective_counts(hlo)
    # Conv row-overlap halo exchanges over the spatial axis.
    assert n['collective-permute'] >= 1, f'no halo exchanges: {n}'
    # The partitioner's last-resort fallback (replicate + repartition) must
    # never fire: it silently costs full-tensor materialization per hit
    # (r03 weak #4 / r04 weak #1 regression tests).
    remat = [ln for ln in cap['text'].splitlines()
             if 'Involuntary full rematerialization' in ln]
    assert not remat, remat[:3]
