"""Worker for the 2-process `jax.distributed` CPU test (test_multihost.py).

Each process owns 4 virtual CPU devices; `initialize_distributed` joins them
into one 8-device runtime. The worker builds the SAME deterministic global
batch, slices out its process-local rows, assembles the global array via
`global_batch_sharding` (the `make_array_from_process_local_data` path that
single-process tests cannot reach), runs ONE real sharded train step (toy-
encoder KBR wiring, as in `__graft_entry__.dryrun_multichip`), and writes the
loss to TWOPROC_OUT. Run with TWOPROC_NPROC=1 for the single-process
reference value (8 local devices, device_put fallback path).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_global_batch(b=8, h=32, w=64):
    rng = np.random.default_rng(0)
    imgs = rng.random((b, h, w, 3), dtype=np.float32)
    supp = np.stack([np.roll(imgs, 1, axis=2), np.roll(imgs, -1, axis=2)])
    K = np.broadcast_to(np.array(
        [[0.6 * w, 0, 0.5 * w, 0], [0, 0.6 * h, 0.5 * h, 0],
         [0, 0, 1, 0], [0, 0, 0, 1.0]], np.float32), (b, 4, 4)).copy()
    x = {'imgs': imgs, 'supp_imgs': supp}
    y = {'imgs': imgs, 'supp_imgs': supp, 'K': K}
    return x, y


def slice_local(tree, lo, hi):
    """This process's batch rows (dim 1 for (n, b, ...) supp stacks)."""
    import jax
    return jax.tree_util.tree_map(
        lambda v: v[:, lo:hi] if v.ndim >= 5 else v[lo:hi], tree)


def main() -> None:
    nproc = int(os.environ['TWOPROC_NPROC'])
    pid = int(os.environ.get('TWOPROC_PID', '0'))
    out_file = os.environ['TWOPROC_OUT']
    local_devices = 8 // nproc

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', local_devices)

    # Join the runtime BEFORE importing the framework: package import builds
    # jnp constants, which would initialize the XLA backend single-process.
    from slowtv_monodepth_tpu.parallel.multihost import (
        global_batch_sharding, initialize_distributed, process_info)
    if nproc > 1:
        initialize_distributed(os.environ['TWOPROC_COORD'], nproc, pid)

    from slowtv_monodepth_tpu import parsers
    from slowtv_monodepth_tpu.core import MonoDepthTrainer
    from slowtv_monodepth_tpu.parallel import make_mesh, make_train_step, replicated

    if nproc > 1:
        assert process_info() == (pid, nproc), process_info()

    cfg = {
        'net': {
            'depth': {'enc_name': 'toy', 'pretrained': False,
                      'dec_name': 'monodepth', 'out_scales': (0, 1, 2, 3)},
            'pose': {'enc_name': 'toy', 'pretrained': False, 'learn_K': True},
        },
        'loss': {
            'img_recon': {'weight': 1, 'use_min': True, 'use_automask': True},
            'disp_smooth': {'weight': 0.001, 'use_edges': True},
        },
        'optimizer': {'type': 'adamw', 'lr': 1e-4, 'weight_decay': 1e-3},
        'trainer': {'min_depth': 0.1, 'max_depth': 100, 'always_fwd_pose': False},
    }
    supp_idxs = (-1, 1)
    x, y = build_global_batch()
    lo, hi = pid * (8 // nproc), (pid + 1) * (8 // nproc)

    trainer = MonoDepthTrainer(cfg)
    tx = parsers.make_optimizer(cfg, steps_per_epoch=100)

    mesh = make_mesh(8, platform='cpu')
    with mesh, jax.default_device(jax.local_devices()[0]):
        # Identical on every process (same key, same shapes) -> replicate.
        state = trainer.init_state(jax.random.PRNGKey(1), x, supp_idxs, tx)
        repl = replicated(mesh)
        state = jax.device_put(
            state, jax.tree_util.tree_map(lambda _: repl, state))
        xb = global_batch_sharding(mesh, slice_local(x, lo, hi))
        yb = global_batch_sharding(mesh, slice_local(y, lo, hi))
        rng = jax.device_put(jax.random.PRNGKey(2), repl)
        step = make_train_step(trainer, supp_idxs, tx, mesh=mesh, donate=False)
        new_state, scalars = step(state, xb, yb, rng)
        loss = float(scalars['loss'])
        step_no = int(jax.device_get(
            jax.tree_util.tree_leaves(new_state.step)[0]))

    with open(out_file, 'w') as f:
        f.write(f'{loss:.10f} {step_no}\n')
    print(f'worker pid={pid}/{nproc}: loss={loss:.10f}')


if __name__ == '__main__':
    main()
