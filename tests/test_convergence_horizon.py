"""Convergence-horizon trajectory differential vs the ACTUAL reference code
(VERDICT r04 item 5).

The 20-step differentials (`test_trajectory_parity.py`) bound fast drift;
this extends the horizon to 200+ full optimizer steps of the KBR recipe with
every slow-accumulation mechanism live:

- LR schedule stepping (linear warmup + StepLR chained, stepped per epoch
  with steps_per_epoch=20 -> multiple LR changes inside the horizon; the
  reference side steps `ChainedScheduler` exactly as Lightning does, at
  epoch end — catches schedule off-by-one/interval drift),
- multi-dataset round-robin batches (two synthetic "datasets" with
  different texture statistics and intrinsics, alternated per step like
  `ConcatDataLoader`),
- aspect-ratio augmentation ON with SHARED host sampling: the aug is
  applied once on the host (our `core/aspect_ratio` samplers + resample)
  and the identical augmented pixels feed both frameworks, so the
  trajectory exercises heterogeneous bucketed shapes (one executable per
  bucket on our side) while staying a controlled differential.

What a 200-step differential can and cannot assert: the self-supervised
photometric objective is a chaotic system — two f32 implementations with
different reduction orders decorrelate stepwise after ~100 steps no matter
how faithful the math (measured here: stepwise drift 1e-6 at step 10,
O(1e-1) past step ~150, while the schedules agree EXACTLY). So the test
separates the failure modes:

- systematic drift (wrong eps/weight-decay mask/schedule boundary): caught
  by (a) an EXACT per-step LR-schedule differential over the horizon
  (`test_schedule_horizon_parity`, no nets, fast) and (b) drift gates on
  the first 60 steps — spanning the warmup ramp and the step-40 StepLR
  decay, where any boundary off-by-one is a 2-10x LR jump. Gated on
  per-window MEDIANS, not maxima: the windowed
  max is run-to-run volatile (measured 3.2e-2 vs 8.2e-2 at ~step 58 for
  two faithful graphs differing only in resize fusion order) because
  chaotic amplification varies per batch, while the medians are stable
  (measured: 2.5e-5 @ [0,20), 3.6e-3 @ [20,40), 1.1e-2 @ [40,60)) and a
  systematic LR/optimizer bug shifts the whole window, not one batch,
- chaotic decorrelation: tolerated late, but bounded three ways — the
  MEDIAN stepwise drift over the whole horizon stays small (the
  trajectories keep tracking; only sensitive batches spike), the
  last-50-step mean log-losses agree within 5% (same attractor), and both
  frameworks converge (late mean < early mean). A systematic bug (wrong
  wd mask, optimizer eps, schedule interval) fails ALL of these with a
  persistent offset.

Runtime: ~15-30 min on 1 CPU core (slow-marked); override the horizon with
SLOWTV_HORIZON_STEPS.
"""
import copy
import os
import random
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from ref_compat import (import_reference, install_timm_resnet18,  # noqa: E402
                        make_create_optimizer_v2)

src = import_reference()
if src is None:
    pytest.skip('reference not importable', allow_module_level=True)
import torch  # noqa: E402

import jax  # noqa: E402

from slowtv_monodepth_tpu import parsers  # noqa: E402
from slowtv_monodepth_tpu.core import MonoDepthTrainer  # noqa: E402
from slowtv_monodepth_tpu.models.import_reference import \
    convert_reference_ckpt  # noqa: E402
from slowtv_monodepth_tpu.parallel import make_train_step  # noqa: E402

B, H, W = 2, 96, 128
SUPP_IDXS = (-1, 1)
STEPS_PER_EPOCH = 20
N_STEPS = int(os.environ.get('SLOWTV_HORIZON_STEPS', '200'))
# Gate calibration — see docstring ("what this can and cannot assert").
# Measured (2026-08-20, pinned env, two runs): window medians 2.5e-5 /
# 3.6e-3 / 1.1e-2, full median 2.1e-2 and 4.1e-2, last-50 dlog 3.4e-2 and
# 2.4e-2, both frameworks 0.322 -> 0.038. Bands sit 3-40x above measured;
# a systematic bug (2-10x LR, wrong wd mask/eps) lands orders above.
WINDOW_MEDIAN_GATES = (((0, 20), 1e-3), ((20, 40), 2e-2), ((40, 60), 5e-2))
MEDIAN_RTOL = 1e-1
LATE_WINDOW = 50
LATE_LOGMEAN_TOL = 0.05


def make_cfg():
    return {
        'net': {
            'depth': {'enc_name': 'resnet18', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': [0, 1]},
            'pose': {'enc_name': 'resnet18', 'pretrained': False,
                     'learn_K': True},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        # Warmup ends inside the horizon and StepLR decays every 2 epochs =
        # 40 steps: >= 5 distinct LR plateaus over 200 steps.
        'scheduler': {'steplr': {'step_size': 2, 'gamma': 0.5},
                      'linear': {'start_factor': 0.1, 'total_iters': 3}},
        'loader': {'batch_size': B},
        'trainer': {'min_depth': 0.1, 'max_depth': 100,
                    'always_fwd_pose': False, 'matmul': 'highest'},
    }


def _dataset_batch(rng, kind: str):
    """One synthetic batch; `kind` selects the 'dataset' (texture + K)."""
    kron = 4 if kind == 'a' else 2
    gain = 1.0 if kind == 'a' else 0.8
    base = rng.random((B, H // kron, W // kron, 3), dtype=np.float32)
    imgs = np.kron(base, np.ones((1, kron, kron, 1), np.float32))
    imgs = np.clip(gain * imgs + 0.05 * rng.random((B, H, W, 3), dtype=np.float32), 0, 1)
    # ASYMMETRIC support motion (-2 px vs +6 px): symmetric rolls make the
    # two reprojection errors near-equal, and the min-reprojection argmin
    # then flips between frameworks under f32 noise — an O(loss) per-step
    # jump that is branch sensitivity, not drift (the same reason
    # test_trajectory_parity keeps its error field away from automask ties).
    supp = np.stack([np.roll(imgs, 4 * i + 2, axis=2) for i in SUPP_IDXS])
    f = 0.6 if kind == 'a' else 0.8
    K = np.broadcast_to(np.array(
        [[f * W, 0, 0.5 * W, 0], [0, f * H, 0.5 * H, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32), (B, 4, 4)).copy()
    return {'imgs': imgs, 'supp_imgs': supp, 'K': K}


def make_augmented_batches(n_steps, seed=11):
    """Round-robin datasets + AR-aug applied ONCE on host (shared pixels).

    Uses the real `core/aspect_ratio.aspect_ratio_aug` (host RNG, fused
    resample on CPU-jax) and hands both frameworks the identical numpy
    result — shapes vary per step across the 32-multiple buckets.
    """
    from slowtv_monodepth_tpu.core.aspect_ratio import aspect_ratio_aug
    rng = np.random.default_rng(seed)
    ar_rng = random.Random(seed)
    batches = []
    for i in range(n_steps):
        import jax.numpy as jnp
        b = _dataset_batch(rng, 'a' if i % 2 == 0 else 'b')
        x = {'imgs': jnp.asarray(b['imgs']),
             'supp_imgs': jnp.asarray(b['supp_imgs'])}
        y = {**x, 'K': jnp.asarray(b['K'])}
        # p=0.7: a mix of augmented and passthrough steps like training.
        xa, ya, _ = aspect_ratio_aug((x, y, {}), p=0.7, crop_min=0.7,
                                     ref_shape=(H, W), rng=ar_rng)
        if min(xa['imgs'].shape[1:3]) < 64:
            # The REFERENCE stack needs >=2px at stride 32 for its
            # reflect-padded decoder (test_trajectory_parity.py header);
            # production shapes never bucket this low — keep the
            # differential inside both stacks' envelopes.
            xa, ya = x, y
        batches.append({'imgs': np.asarray(xa['imgs']),
                        'supp_imgs': np.asarray(xa['supp_imgs']),
                        'K': np.asarray(ya['K'])})
    shapes = {b['imgs'].shape[1:3] for b in batches}
    assert all(h % 32 == 0 and w % 32 == 0 for h, w in shapes), shapes
    return batches, shapes


def run_reference(cfg, batches):
    install_timm_resnet18()
    import src.tools.parsers as ref_parsers
    ref_parsers.create_optimizer_v2 = make_create_optimizer_v2()

    from src.core.trainer import MonoDepthModule
    from src.utils import MultiLevelTimer

    class Module(MonoDepthModule):
        def save_hyperparameters(self):
            pass

        def log_dict(self, *a, **kw):
            pass

    torch.manual_seed(0)
    module = Module(copy.deepcopy(cfg))
    module.timer = MultiLevelTimer(as_ms=True)
    sd0 = {f'nets.{k}': v.detach().clone().numpy()
           for k, v in module.nets.state_dict().items()}

    out = module.configure_optimizers()
    opt, sched = out['optimizer'], out.get('lr_scheduler')
    assert sched is not None, 'scheduler must be live for this test'
    losses, comps, lrs = [], [], []
    for i, b in enumerate(batches):
        x = {'imgs': torch.from_numpy(b['imgs']).permute(0, 3, 1, 2).contiguous(),
             'supp_imgs': torch.from_numpy(b['supp_imgs']).permute(0, 1, 4, 2, 3).contiguous(),
             'supp_idxs': torch.tensor(SUPP_IDXS)}
        y = {'imgs': x['imgs'].clone(), 'supp_imgs': x['supp_imgs'].clone(),
             'K': torch.from_numpy(b['K'])}
        loss, loss_dict, _ = module.step((x, y, {}), mode='train')
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        # Lightning steps epoch-interval schedulers at epoch end.
        if (i + 1) % STEPS_PER_EPOCH == 0:
            sched.step()
        losses.append(float(loss.detach()))
        comps.append({k: float(v.detach()) for k, v in loss_dict.items()
                      if k.startswith('loss_') and v.ndim == 0})
        lrs.append(float(opt.param_groups[0]['lr']))
    return sd0, losses, comps, lrs


def run_ours(cfg, sd0, batches):
    import jax.numpy as jnp

    cfg = copy.deepcopy(cfg)
    params, aux = convert_reference_ckpt(sd0, cfg)
    trainer = MonoDepthTrainer(cfg)
    tx = parsers.make_optimizer(cfg, steps_per_epoch=STEPS_PER_EPOCH)
    x0 = {'imgs': jnp.asarray(batches[0]['imgs']),
          'supp_imgs': jnp.asarray(batches[0]['supp_imgs'])}
    state = trainer.init_state(jax.random.PRNGKey(0), x0, SUPP_IDXS, tx)
    aux = {**state.aux, **aux}
    state = state.replace(params=params, aux=aux, opt_state=tx.init(params))

    step = make_train_step(trainer, SUPP_IDXS, tx, donate=False)
    losses, comps = [], []
    for i, b in enumerate(batches):
        x = {'imgs': jnp.asarray(b['imgs']),
             'supp_imgs': jnp.asarray(b['supp_imgs'])}
        y = {**x, 'K': jnp.asarray(b['K'])}
        state, scalars = step(state, x, y, jax.random.PRNGKey(100 + i))
        losses.append(float(scalars['loss']))
        comps.append({k: float(v) for k, v in scalars.items()
                      if k.startswith('loss_')})
    return losses, comps


@pytest.mark.slow
def test_convergence_horizon_trajectory():
    cfg = make_cfg()
    batches, shapes = make_augmented_batches(N_STEPS)
    # The aug must actually produce shape heterogeneity (several buckets).
    assert len(shapes) >= 2, shapes

    sd0, ref_losses, ref_comps, ref_lrs = run_reference(cfg, batches)
    our_losses, our_comps = run_ours(cfg, sd0, batches)

    assert all(np.isfinite(ref_losses)) and all(np.isfinite(our_losses))
    # The schedule must have actually changed the LR inside the horizon.
    assert len({round(lr, 10) for lr in ref_lrs}) >= 3, sorted(set(ref_lrs))

    ref_a, our_a = np.asarray(ref_losses), np.asarray(our_losses)
    rel = np.abs(our_a - ref_a) / np.maximum(np.abs(ref_a), 1e-6)
    # Full trajectories on disk for post-mortem (printed profile below).
    np.savez('/tmp/slowtv_horizon_traj.npz', ref=ref_a, ours=our_a,
             lrs=np.asarray(ref_lrs))
    prof = [f'{lo}-{min(lo + 20, N_STEPS)}: {rel[lo:lo + 20].max():.1e}'
            for lo in range(0, N_STEPS, 20)]
    print(f'stepwise-drift profile (max/20-step window): {prof}')

    # Systematic-drift gates: warmup ramp + the step-40 StepLR boundary.
    for (lo, hi), band in WINDOW_MEDIAN_GATES:
        med_w = float(np.median(rel[lo:hi]))
        assert med_w <= band, (
            f'median drift {med_w:.2e} over steps [{lo},{hi}) '
            f'(band {band:.0e}) — systematic divergence, not chaos')

    # Per-component drift where chaos is still negligible. Pre-r05 this
    # caught the antialiased-downsample resize bug as a persistent 1.7%
    # disp_smooth offset AT STEP 0 (see module docstring).
    keys = set(ref_comps[0]) & set(our_comps[0])
    assert keys, (list(ref_comps[0]), list(our_comps[0]))
    for k in keys:
        r = np.asarray([c[k] for c in ref_comps[:20]])
        o = np.asarray([c[k] for c in our_comps[:20]])
        relk = np.abs(o - r) / np.maximum(np.abs(r), 1e-6)
        assert float(np.median(relk)) <= 1e-2, (
            f'{k}: median drift {np.median(relk):.2e} over first 20 steps')

    # The trajectories must keep TRACKING stepwise for most steps even
    # late (only sensitive batches spike under chaotic amplification).
    med = float(np.median(rel))
    assert med <= MEDIAN_RTOL, f'median stepwise drift {med:.2e}'

    # Same-attractor check over the tail: chaotic stepwise decorrelation is
    # expected; a systematic offset (wrong wd/eps) is not.
    late_r, late_o = ref_a[-LATE_WINDOW:], our_a[-LATE_WINDOW:]
    dlog = abs(float(np.mean(np.log(late_o)) - np.mean(np.log(late_r))))
    assert dlog <= LATE_LOGMEAN_TOL, (
        f'last-{LATE_WINDOW} mean log-loss differs by {dlog:.3f} '
        f'(tol {LATE_LOGMEAN_TOL}) — trajectories left the shared attractor')
    assert np.mean(late_r) < np.mean(ref_a[:10]), 'reference did not converge'
    assert np.mean(late_o) < np.mean(our_a[:10]), 'ours did not converge'

    print(f'\nhorizon={N_STEPS} buckets={sorted(shapes)} '
          f'window_medians={[f"{float(np.median(rel[lo:hi])):.1e}" for (lo, hi), _ in WINDOW_MEDIAN_GATES]} '
          f'median={med:.2e} late_dlog={dlog:.4f} '
          f'end_drift={rel[-1]:.2e} lr_plateaus={len(set(ref_lrs))}')


def test_schedule_horizon_parity():
    """EXACT per-step LR differential over the horizon (no nets — the
    sharpest systematic-drift detector, and fast). Covers the chained
    linear-warmup x StepLR composition the KBR recipe uses, stepped at
    epoch end exactly as Lightning does."""
    import src.tools.parsers as ref_parsers
    from torch.optim.lr_scheduler import ChainedScheduler

    from slowtv_monodepth_tpu.parsers import get_sched

    cfg = make_cfg()
    lr = cfg['optimizer']['lr']
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr)
    sch = ChainedScheduler(list(
        ref_parsers.get_sched(opt, cfg['scheduler']).values()))
    t_lrs = []
    for i in range(N_STEPS):
        t_lrs.append(opt.param_groups[0]['lr'])
        opt.step()
        if (i + 1) % STEPS_PER_EPOCH == 0:
            sch.step()

    sched = get_sched(cfg['scheduler'], lr, STEPS_PER_EPOCH)
    o_lrs = np.asarray([float(sched(i)) for i in range(N_STEPS)])
    np.testing.assert_allclose(o_lrs, np.asarray(t_lrs), rtol=1e-6)
    assert len(set(t_lrs)) >= 5  # warmup ramp + several decays exercised
