"""Per-loss handlers: reshape multi-scale dicts into flat batches and call losses.

Capability parity with the reference handlers (`src/core/handlers.py:14-347`),
re-designed for XLA:

- All multi-scale upsampled predictions share the full (h, w) resolution, so
  scales are concatenated onto the batch axis and each handler issues a single
  large batched `view_synth` call (one fused backproject/project/gather chain
  on device instead of the reference's per-loss Python flatten dance).
- Handlers are pure functions of arrays + an explicit PRNG key; the loss
  objects (`losses.*`) hold only static configuration.

Shapes (NHWC): `depths` {s: (b, h, w, 1)}, `masks` {s: (b, h, w, n)},
`imgs` (b, h, w, 3), `supp_imgs` (n, b, h, w, 3), `Ts` (n, b, 4, 4),
`Ks` (b, 4, 4).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import resize_like, view_synth

__all__ = [
    'image_recon', 'feat_recon', 'autoenc_recon',
    'stereo_const', 'depth_regr',
    'disp_smooth', 'disp_occ', 'disp_mask', 'feat_smooth',
]


def _stack_scales(d: dict) -> jnp.ndarray:
    """{s: (b, ...)} -> (s*b, ...) ordered by ascending scale."""
    return jnp.concatenate([d[k] for k in sorted(d)], axis=0)


def _tile_scales(x: jnp.ndarray, n_sc: int) -> jnp.ndarray:
    """(b, ...) -> (s*b, ...) repeated per scale."""
    return jnp.concatenate([x] * n_sc, axis=0)


def _batched_synth(supp_imgs: jnp.ndarray, depths: jnp.ndarray,
                   Ts: jnp.ndarray, Ks: jnp.ndarray,
                   warp_bf16: bool = False) -> jnp.ndarray:
    """One view-synthesis call over (n, m) flattened support/scale batches.

    :param supp_imgs: (n, m, h, w, c) support frames.
    :param depths: (m, h, w, 1) target depths (shared across n).
    :param Ts: (n, m, 4, 4) target->support transforms.
    :param Ks: (m, 4, 4) intrinsics (shared across n).
    :param warp_bf16: Quantize the warp SOURCES to bf16 (TPU recipe option —
        finer than the 8-bit video content; runs the packed-plane Pallas
        kernel, `ops/pallas_warp._kernel_packed`). Warp outputs stay f32.
    :return: (n, m, h, w, c) warped support frames.
    """
    n, m, h, w, c = supp_imgs.shape
    src = supp_imgs.reshape(n * m, h, w, c)
    if warp_bf16:
        src = src.astype(jnp.bfloat16)
    depth_f = jnp.broadcast_to(depths, (n,) + depths.shape).reshape(n * m, h, w, 1)
    Ks_f = jnp.broadcast_to(Ks, (n,) + Ks.shape).reshape(n * m, 4, 4)
    warped, _, _ = view_synth(src, depth_f, Ts.reshape(n * m, 4, 4), Ks_f)
    return warped.reshape(n, m, h, w, c)


def image_recon(crit, depths: dict, masks: Optional[dict], imgs: jnp.ndarray,
                supp_imgs: jnp.ndarray, Ts: jnp.ndarray, Ks: jnp.ndarray,
                rng: Optional[jax.Array] = None, warp_bf16: bool = False):
    """Photometric reconstruction loss over all scales (ref `handlers.py:14-67`).

    `loss_dict` contains only scale-0 outputs, matching the reference.
    """
    n, b = supp_imgs.shape[:2]
    n_sc = len(depths)

    depths_s = _stack_scales(depths)                      # (s*b, h, w, 1)
    masks_s = _stack_scales(masks) if masks is not None else None  # (s*b, h, w, n)
    imgs_s = _tile_scales(imgs, n_sc)                     # (s*b, 3)
    supp_s = jnp.concatenate([supp_imgs] * n_sc, axis=1)  # (n, s*b, h, w, 3)
    Ts_s = jnp.concatenate([Ts] * n_sc, axis=1)           # (n, s*b, 4, 4)
    Ks_s = _tile_scales(Ks, n_sc)                         # (s*b, 4, 4)

    warped = _batched_synth(supp_s, depths_s, Ts_s, Ks_s,
                            warp_bf16=warp_bf16)          # (n, s*b, h, w, 3)
    # The automask static error is scale-independent: pass the UNTILED support
    # frames so the crit computes it once per base batch and tiles (bitwise
    # identical, skips 3/4 of that full-res SSIM). Predicted weighting masks
    # differ per scale, so that path keeps the tiled source.
    src = supp_imgs if masks_s is None else supp_s
    loss, ld = crit(warped, imgs_s, source=src, mask=masks_s, rng=rng)

    ld = {k: v[:b] for k, v in ld.items()}  # Scale 0 only.
    ld['supp_imgs_warp'] = warped[:, :b]
    return loss, ld


def feat_recon(crit, depths: dict, masks: Optional[dict], feats, supp_feats,
               Ts: jnp.ndarray, Ks: jnp.ndarray, rng: Optional[jax.Array] = None):
    """Feature-based reconstruction at scale 0 only (ref `handlers.py:70-119`).

    Features are x4-downsampled encoder outputs, resized to full resolution
    with gradients stopped (the reference detaches, `:105-111`).
    """
    if isinstance(feats, (list, tuple)):
        feats = feats[-4]
        supp_feats = supp_feats[-4]  # (n, b, h/4, w/4, c)

    feats = jax.lax.stop_gradient(feats)
    supp_feats = jax.lax.stop_gradient(supp_feats)

    depth0 = depths[0]
    feats = resize_like(feats, depth0)
    n = supp_feats.shape[0]
    supp_feats = jax.vmap(lambda f: resize_like(f, depth0))(supp_feats)  # (n, b, h, w, c)

    masks0 = {0: masks[0]} if masks is not None else None
    loss, ld = image_recon(crit, {0: depth0}, masks0, feats, supp_feats, Ts, Ks, rng=rng)
    return loss, {'supp_feats_warp': ld.pop('supp_imgs_warp')}


def autoenc_recon(crit, preds: dict, targets: jnp.ndarray,
                  supp_preds: dict, supp_targets: jnp.ndarray):
    """Autoencoder image reconstruction (ref `handlers.py:122-148`)."""
    n_sc = len(preds)
    n = supp_targets.shape[0]

    preds_s = _stack_scales(preds)  # (s*b, h, w, 3)
    # supp_preds {s: (n, b, h, w, 3)} -> (s*n*b, h, w, 3)
    supp_preds_s = jnp.concatenate(
        [supp_preds[k].reshape((-1,) + supp_preds[k].shape[2:]) for k in sorted(supp_preds)], axis=0)

    targets_s = _tile_scales(targets, n_sc)
    supp_targets_f = supp_targets.reshape((-1,) + supp_targets.shape[2:])  # (n*b, ...)
    supp_targets_s = _tile_scales(supp_targets_f, n_sc)

    loss, _ = crit(jnp.concatenate([preds_s, supp_preds_s]),
                   jnp.concatenate([targets_s, supp_targets_s]))
    return loss, {}


def stereo_const(crit, disps: dict, depths: dict, disps_stereo: dict,
                 depths_stereo: dict, T_stereo: jnp.ndarray, K: jnp.ndarray):
    """Virtual-stereo disparity consistency (ref `handlers.py:151-198`).

    Warps the mono disparity into the virtual-stereo view (and vice versa) and
    regresses one against the other.
    """
    n_sc = len(disps)
    b = T_stereo.shape[0]

    disps_s = _stack_scales(disps)                  # (s*b, h, w, 1)
    depths_s = _stack_scales(depths)
    disps_st_s = _stack_scales(disps_stereo)
    depths_st_s = _stack_scales(depths_stereo)

    T_s = _tile_scales(T_stereo, n_sc)              # (s*b, 4, 4)
    T_inv_s = _tile_scales(rigid_inverse(T_stereo), n_sc)
    K_s = jnp.concatenate([_tile_scales(K, n_sc)] * 2, axis=0)  # (2*s*b, 4, 4)

    all_warp, _, _ = view_synth(
        jnp.concatenate([disps_st_s, disps_s]),
        jnp.concatenate([depths_s, depths_st_s]),
        jnp.concatenate([T_s, T_inv_s]), K_s)  # (2*s*b, h, w, 1)

    all_disps = jnp.concatenate([disps_st_s, disps_s])
    loss, _ = crit(all_disps, all_warp)
    m = n_sc * b
    return loss, {
        'disps_warp': all_warp[m:m + b],
        'stereo_disps_warp': all_warp[:b],
    }


def depth_regr(crit, photo, depths: dict, targets: jnp.ndarray, imgs: jnp.ndarray,
               supp_imgs: jnp.ndarray, Ts: jnp.ndarray, Ks: jnp.ndarray):
    """Proxy depth-hint regression with optional DepthHints automask
    (ref `handlers.py:201-259`).

    :param photo: `crit_recon.compute_photo` of the image reconstruction loss.
    """
    n_sc = len(depths)
    b = imgs.shape[0]

    imgs_s = _tile_scales(imgs, n_sc)
    depths_s = _stack_scales(depths)
    targets_s = _tile_scales(targets, n_sc)
    masks = targets_s > 0

    ld_extra = {}
    if crit.use_automask:
        supp_s = jnp.concatenate([supp_imgs] * n_sc, axis=1)  # (n, s*b, ...)
        Ts_s = jnp.concatenate([Ts] * n_sc, axis=1)
        Ks_s = _tile_scales(Ks, n_sc)

        supp_hints_warp = _batched_synth(supp_s, targets_s, Ts_s, Ks_s)
        supp_imgs_warp = _batched_synth(supp_s, depths_s, Ts_s, Ks_s)

        automask = photo(supp_imgs_warp, imgs_s) > photo(supp_hints_warp, imgs_s)
        ld_extra['automask_hints'] = automask[:b]
        masks = masks & automask

    loss, ld = crit(depths_s, targets_s, masks)
    ld = {'mask_regr': ld['mask_regr'][:b], **ld_extra}
    return loss, ld


def disp_smooth(crit, disps: dict, imgs: jnp.ndarray):
    """Multi-scale smoothness on the raw (non-upsampled) disparities, each
    downweighted by 2**s (ref `handlers.py:262-281`)."""
    ls = {s: crit(disp, resize_like(imgs, disp)) for s, disp in disps.items()}
    loss = jnp.stack([v[0] / 2 ** s for s, v in ls.items()]).mean()
    return loss, ls[min(ls)][1]


def feat_smooth(crit, feats, imgs: jnp.ndarray, supp_feats, supp_imgs: jnp.ndarray):
    """Feature peakiness/smoothness over encoder stages (ref `handlers.py:284-311`)."""
    ls = [crit(f, resize_like(imgs, f))[0] / 2 ** s for s, f in enumerate(feats)]
    loss = jnp.stack(ls).mean()

    supp_imgs_f = supp_imgs.reshape((-1,) + supp_imgs.shape[2:])
    supp_feats_f = [f.reshape((-1,) + f.shape[2:]) for f in supp_feats]
    ls = [crit(f, resize_like(supp_imgs_f, f))[0] / 2 ** s for s, f in enumerate(supp_feats_f)]
    loss = loss + jnp.stack(ls).mean()
    return loss, {}


def disp_occ(crit, disps: dict):
    """Occlusion regularization on raw disparities (ref `handlers.py:314-329`)."""
    ls = {s: crit(d) for s, d in disps.items()}
    loss = jnp.stack([v[0] for v in ls.values()]).mean()
    return loss, ls[min(ls)][1]


def disp_mask(crit, masks: dict):
    """Predictive-mask regularization (ref `handlers.py:332-347`)."""
    ls = {s: crit(m) for s, m in masks.items()}
    loss = jnp.stack([v[0] for v in ls.values()]).mean()
    return loss, ls[min(ls)][1]


def rigid_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid (*, 4, 4) transform: [R^T | -R^T t]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ t], axis=-1)  # (*, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], T.dtype), T.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)
