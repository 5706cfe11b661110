"""END-TO-END training-trajectory differential vs the ACTUAL reference code.

Component-level parity (test_reference_parity.py) can't catch cross-component
drift: disp->depth scaling order, automask composition, optimizer weight-decay
masks, loss averaging across scales. This test composes everything: it builds
the reference `MonoDepthModule` (KBR-style wiring: learned K, min-reproj +
automask + edge-aware smoothness) on real torch networks, converts its random
init into our parameter trees via `models/import_reference.py`, runs several
FULL optimizer steps in both frameworks on identical batches, and asserts the
loss trajectories match.

Reference networks run on a faithful in-test torch resnet18 `features_only`
backbone (ref_compat.install_timm_resnet18 — the env has no timm), and the
reference optimizer path runs through a faithful `create_optimizer_v2` adamw
shim with timm's `filter_bias_and_bn` param-group semantics
(ref `src/tools/parsers.py:243`).
"""
import copy
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

# 64x96: smallest shape the REFERENCE stack accepts (its decoder convs use
# reflection padding, which needs >=2px at stride 32; ours pads zeros and
# runs 32x64 fine).
B, H, W = 2, 64, 96
N_STEPS = 4
SUPP_IDXS = (-1, 1)


def make_cfg():
    """KBR-style recipe at test scale (ref `cfg/kbr/default.yaml` wiring)."""
    return {
        'net': {
            'depth': {'enc_name': 'resnet18', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': [0, 1]},
            'pose': {'enc_name': 'resnet18', 'pretrained': False, 'learn_K': True},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        'loader': {'batch_size': B},
        'trainer': {'min_depth': 0.1, 'max_depth': 100, 'always_fwd_pose': False,
                    'matmul': 'highest'},
    }


def make_batches(n_steps):
    """Identical per-step batches for both frameworks (numpy, NHWC)."""
    rng = np.random.default_rng(7)
    batches = []
    for _ in range(n_steps):
        # Smooth textured images: random low-res upsampled — keeps the
        # photometric error field well away from automask ties.
        base = rng.random((B, H // 4, W // 4, 3), dtype=np.float32)
        imgs = np.kron(base, np.ones((1, 4, 4, 1), np.float32))
        imgs += 0.05 * rng.random((B, H, W, 3), dtype=np.float32)
        imgs = np.clip(imgs, 0, 1)
        supp = np.stack([np.roll(imgs, 3, axis=2), np.roll(imgs, -3, axis=2)])
        K = np.broadcast_to(np.array(
            [[0.6 * W, 0, 0.5 * W, 0], [0, 0.6 * H, 0.5 * H, 0],
             [0, 0, 1, 0], [0, 0, 0, 1]], np.float32), (B, 4, 4)).copy()
        batches.append({'imgs': imgs, 'supp_imgs': supp, 'K': K})
    return batches


def run_reference(cfg, batches):
    """Build the reference MonoDepthModule and run N full optimizer steps."""
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
    module.timer = MultiLevelTimer(as_ms=True)  # No CUDA sync on cpu torch.

    # Initial weights in reference-checkpoint layout, BEFORE any step.
    sd0 = {f'nets.{k}': v.detach().clone().numpy()
           for k, v in module.nets.state_dict().items()}

    opt = module.configure_optimizers()['optimizer']
    losses = []
    for b in batches:
        x = {'imgs': torch.from_numpy(b['imgs']).permute(0, 3, 1, 2).contiguous(),
             'supp_imgs': torch.from_numpy(b['supp_imgs']).permute(0, 1, 4, 2, 3).contiguous(),
             'supp_idxs': torch.tensor(SUPP_IDXS)}
        y = {'imgs': x['imgs'].clone(), 'supp_imgs': x['supp_imgs'].clone(),
             'K': torch.from_numpy(b['K'])}
        loss, _, _ = module.step((x, y, {}), mode='train')
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return sd0, losses


def run_ours(cfg, sd0, batches):
    """Load the converted reference init and run the same N steps here."""
    import jax.numpy as jnp

    cfg = copy.deepcopy(cfg)
    params, aux = convert_reference_ckpt(sd0, cfg)

    trainer = MonoDepthTrainer(cfg)
    tx = parsers.make_optimizer(cfg)
    x0 = {'imgs': jnp.asarray(batches[0]['imgs']),
          'supp_imgs': jnp.asarray(batches[0]['supp_imgs'])}
    state = trainer.init_state(jax.random.PRNGKey(0), x0, SUPP_IDXS, tx)

    # The converted trees must be drop-in for the initialized ones.
    for k in state.params:
        assert (jax.tree_util.tree_structure(state.params[k])
                == jax.tree_util.tree_structure(params[k])), k
    aux = {**state.aux, **aux}
    state = state.replace(params=params, aux=aux,
                          opt_state=tx.init(params))

    step = make_train_step(trainer, SUPP_IDXS, tx, donate=False)
    losses = []
    for i, b in enumerate(batches):
        x = {'imgs': jnp.asarray(b['imgs']), 'supp_imgs': jnp.asarray(b['supp_imgs'])}
        y = {**x, 'K': jnp.asarray(b['K'])}
        state, scalars = step(state, x, y, jax.random.PRNGKey(100 + i))
        losses.append(float(scalars['loss']))
    return losses


def test_full_training_trajectory_matches_reference():
    cfg = make_cfg()
    batches = make_batches(N_STEPS)
    sd0, ref_losses = run_reference(cfg, batches)
    our_losses = run_ours(cfg, sd0, batches)

    assert all(np.isfinite(ref_losses)) and all(np.isfinite(our_losses))
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-4, atol=1e-5,
                               err_msg=f'ref={ref_losses} ours={our_losses}')
    # The trajectory must actually evolve (optimizer steps taking effect).
    assert abs(ref_losses[-1] - ref_losses[0]) > 1e-6
