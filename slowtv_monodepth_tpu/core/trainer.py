"""The training engine: a pure-functional re-design of the reference's
`MonoDepthModule` (`src/core/trainer.py:17-552`).

Instead of a stateful LightningModule, `MonoDepthTrainer` holds only *static*
configuration (network/loss definitions parsed from cfg) and exposes pure
functions over explicit state:

    trainer = MonoDepthTrainer(cfg)
    state   = trainer.init_state(rng, batch, supp_idxs)       # host, once
    step_fn = make_train_step(trainer, supp_idxs, mesh=mesh)  # jitted
    state, scalars = step_fn(state, batch, rng)

Batch layout (NHWC, matching `src/core/trainer.py:121-160` semantics):
    x = {imgs (b,h,w,3), supp_imgs (n,b,h,w,3)}
    y = {imgs, supp_imgs, K (b,4,4), [depth (b,h,w,1)], [depth_hints],
         [T_stereo (b,4,4)]}
`supp_idxs` is a static tuple (it selects the pose-pair wiring and is fixed
per dataset), so it parameterizes the compiled step rather than the batch.

TPU-first step function design:
- forward -> postprocess -> loss is a single traced function; XLA fuses the
  warp/photometric chain; `jax.value_and_grad` differentiates the whole step.
- BatchNorm running stats (`batch_stats`) thread through as explicit state.
- Gradients/metrics are synchronized by the mesh sharding in
  `parallel.make_train_step` (replicated params + batch-sharded data), not by
  framework callbacks.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from .. import parsers
from ..ops import T_from_AAt, resize_K, resize_like, to_inv, to_scaled
from . import handlers as h
from .handlers import rigid_inverse
from .train_metrics import compute_train_metrics

__all__ = ['MonoDepthTrainer', 'TrainState']


class TrainState(flax.struct.PyTreeNode):
    """Pure training state: everything the step function mutates."""
    step: jnp.ndarray
    params: Any      # {net_key: param tree}
    aux: Any         # {net_key: {'batch_stats': ...}} (may be empty dicts)
    opt_state: Any
    # Device-side anomaly tripwire: index of the FIRST step whose loss was
    # non-finite (-1 = clean). The reference's `DetectAnomaly` raises every
    # step (`src/utils/callbacks.py:27-31`); a per-step host sync would stall
    # the TPU, so the flag rides in the carried state at zero steady-state
    # cost and the loop raises (with the exact step index) at its next fetch.
    bad_step: Any = None


class MonoDepthTrainer:
    """Static configuration + pure step functions for monodepth training."""

    def __init__(self, cfg: dict):
        self.cfg = cfg
        self.nets = parsers.get_net(cfg['net'])
        self.losses, self.weights = parsers.get_loss(cfg['loss'])

        tcfg = cfg.get('trainer', {})
        self.min_depth = tcfg.get('min_depth', None)
        self.max_depth = tcfg.get('max_depth', None)
        self.should_scale = bool(self.min_depth or self.max_depth)
        self.always_fwd_pose = tcfg.get('always_fwd_pose', True)
        # TPU mixed precision: 'bf16' runs network forward/backward in
        # bfloat16 (master params and losses stay f32). Unlike the fp16 that
        # NaN'd the reference (`cfg/default.yaml:174`), bf16 keeps the f32
        # exponent range, so no loss scaling is needed. Measured on v5e
        # (KBR step, batch 4 @ 384x640): 127.5 -> 109.0 ms (+17%) once the
        # warp/photometric Pallas kernels removed the f32 loss bottlenecks —
        # the win is halved activation HBM traffic and no f32<->bf16 convert
        # passes around the MXU. (An earlier measurement taken while the
        # step was warp-gather-bound showed no win; that conclusion was
        # bottleneck-masking, not a property of bf16.)
        self.precision = str(tcfg.get('precision', 32))
        # TPU recipe option: quantize the photometric warp SOURCES to bf16
        # (finer than the 8-bit video content; the packed-plane Pallas warp
        # kernel then does its gather/select work on half the planes). Warp
        # outputs and the whole loss chain stay f32.
        self.warp_bf16 = bool(tcfg.get('warp_bf16', False))
        # Rematerialization: recompute network activations in the backward
        # pass instead of storing them (jax.checkpoint), trading ~30% step
        # FLOPs for activation memory — the TPU lever for larger batches or
        # full-resolution SlowTV training on small-HBM chips.
        self.remat = bool(tcfg.get('remat', False))

        self.scales = tuple(self.nets['depth'].out_sc)
        self.n_scales = len(self.scales)

    # ------------------------------------------------------------------ utils
    def to_depth(self, disp: jnp.ndarray) -> jnp.ndarray:
        """Sigmoid disparity -> scaled depth (ref `trainer.py:47-49`)."""
        if self.should_scale:
            return to_scaled(disp, self.min_depth, self.max_depth)[1]
        return to_inv(disp)

    def _apply(self, key: str, params, aux, x, train: bool, method=None):
        """Apply one net (optionally a bound `method`); returns (out, new_aux)
        threading batch_stats.

        Under bf16 precision, params and inputs cast to bfloat16 for the
        network pass and every floating output casts back to f32 (losses and
        the automatic grad-cast transpose stay f32).
        """
        p = params[key]
        if self.precision == 'bf16':
            p = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v, p)
            x = x.astype(jnp.bfloat16)
        variables = {'params': p, **aux.get(key, {})}
        net = self.nets[key]
        if train and 'batch_stats' in aux.get(key, {}):
            fn = lambda v, xx: net.apply(v, xx, train=True, mutable=['batch_stats'],  # noqa: E731
                                         method=method)
            if self.remat:
                fn = jax.checkpoint(fn)
            out, updated = fn(variables, x)
            new_aux = dict(updated)
        else:
            fn = lambda v, xx: net.apply(v, xx, train=train, method=method)  # noqa: E731
            if self.remat and train:
                fn = jax.checkpoint(fn)
            out, new_aux = fn(variables, x), aux.get(key, {})
        if self.precision == 'bf16':
            out = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.float32)
                if hasattr(v, 'dtype') and v.dtype == jnp.bfloat16 else v, out)
        return out, new_aux

    # ---------------------------------------------------------------- forward
    def forward(self, params, aux, x, supp_idxs: tuple, train: bool):
        """Network forward pass (ref `trainer.py:192-278`).

        :return: (fwd dict, new_aux dict).
        """
        fwd: dict = {}
        new_aux: dict = {}
        imgs = x['imgs']

        for key in self.nets:
            if key == 'depth':
                out, new_aux['depth'] = self._apply('depth', params, aux, imgs, train)
                fwd.update(out)

            elif key == 'pose':
                should_inv = lambda i: self.always_fwd_pose and i < 0  # noqa: E731
                idxs = [i for i in supp_idxs if i != 0]
                pairs = jnp.stack([
                    jnp.concatenate([supp, imgs] if should_inv(i) else [imgs, supp], axis=-1)
                    for i, supp in zip(supp_idxs, x['supp_imgs']) if i != 0
                ])  # (n', b, h, w, 6)
                n, b = pairs.shape[:2]

                out, new_aux['pose'] = self._apply(
                    'pose', params, aux, pairs.reshape((n * b,) + pairs.shape[2:]), train)
                Ts = T_from_AAt(out['R'][:, 0], out['t'][:, 0]).reshape(n, b, 4, 4)

                for i, T in zip(idxs, Ts):
                    fwd[f'T_{i}'] = rigid_inverse(T) if should_inv(i) else T

                if 'fs' in out and 'fs' not in fwd:
                    fwd['fs'] = out['fs'].reshape(n, b, 2)
                    fwd['cs'] = out['cs'].reshape(n, b, 2)
                    # Use only the Ks predicted for the first support image.
                    K = self.nets['pose'].build_K(out['fs'], out['cs']).reshape(n, b, 4, 4)[0]
                    fwd['K'] = resize_K(K, imgs.shape[1:3])

            elif key == 'autoencoder':
                out, new_aux['autoencoder'] = self._apply('autoencoder', params, aux, imgs, train)
                fwd.update(out)

                # The support pass runs in the SAME mode as the target pass
                # (ref `trainer.py:269-272` calls one train-mode net on both):
                # BatchNorm must use batch statistics, and its running-stat
                # update chains on the target pass's update.
                n, b = x['supp_imgs'].shape[:2]
                supp_flat = x['supp_imgs'].reshape((n * b,) + x['supp_imgs'].shape[2:])
                aux_chained = {**aux, 'autoencoder': new_aux['autoencoder']}
                out_supp, new_aux['autoencoder'] = self._apply(
                    'autoencoder', params, aux_chained, supp_flat, train)
                fwd['supp_autoenc_feats'] = [f.reshape((n, b) + f.shape[1:])
                                             for f in out_supp['autoenc_feats']]
                fwd['supp_autoenc_imgs'] = {
                    s: v.reshape((n, b) + v.shape[1:])
                    for s, v in out_supp['autoenc_imgs'].items()}

            else:
                raise KeyError(f'Unrecognized net key: {key}.')

        return fwd, new_aux

    # ------------------------------------------------------------ postprocess
    def forward_postprocess(self, fwd: dict, x: dict, y: dict, supp_idxs: tuple) -> dict:
        """Upsample predictions, convert to depth, assemble poses
        (ref `trainer.py:280-348`)."""
        imgs = x['imgs']
        new = {}
        for k, v in fwd.items():
            k_up = f'{k}_up'
            if 'disp' in k:
                new[k_up] = {s: resize_like(d, imgs) for s, d in v.items()}
                new[k_up.replace('disp', 'depth')] = {
                    s: self.to_depth(d) for s, d in new[k_up].items()}
            elif 'mask' in k:
                new[k_up] = {s: resize_like(m, imgs) for s, m in v.items()}
            elif k == 'autoenc_imgs':
                new[k_up] = {s: resize_like(p, imgs) for s, p in v.items()}
            elif k == 'supp_autoenc_imgs':
                new[k_up] = {
                    s: jax.vmap(lambda p: resize_like(p, imgs))(v[s]) for s in v}
        fwd = {**fwd, **new}

        # VIRTUAL STEREO: select the channel facing the real stereo pair.
        if 'disp_stereo' in fwd:
            if 'T_stereo' not in y:
                raise KeyError('Missing stereo transform "T_stereo".')
            idx = (y['T_stereo'][:, 0, 3] > 0).astype(jnp.int32)  # (b,)
            sel = idx[:, None, None, None]
            for k in ('disp_stereo', 'disp_stereo_up', 'depth_stereo_up', 'mask_stereo',
                      'mask_stereo_up'):
                if k in fwd:
                    fwd[k] = {s: jnp.take_along_axis(d, sel, axis=-1)
                              for s, d in fwd[k].items()}

        # CONCATENATE POSES (stereo frames use the dataset-provided transform).
        fwd['Ts'] = jnp.stack([
            (y['T_stereo'] if i == 0 else fwd[f'T_{i}']) for i in supp_idxs])
        return fwd

    # ------------------------------------------------------------------- loss
    def forward_loss(self, fwd: dict, x: dict, y: dict, supp_idxs: tuple,
                     rng: jax.Array, params=None, aux=None, train: bool = True):
        """Dispatch every configured loss (ref `trainer.py:350-472`)."""
        y = dict(y)
        idx_stereo = next((j for j, i in enumerate(supp_idxs) if i == 0), None)
        if 'disp_stereo' in fwd and idx_stereo is not None:
            y['imgs_stereo'] = y['supp_imgs'][idx_stereo]

        Ks = fwd.get('K', y['K'])
        loss = jnp.asarray(0.0, jnp.float32)
        loss_dict: dict = {}
        rngs = jax.random.split(rng, max(len(self.losses), 1))

        for rng_k, (k, crit) in zip(rngs, self.losses.items()):
            l2, ld2 = None, None

            if k == 'img_recon':
                l, ld = h.image_recon(
                    crit, fwd['depth_up'], fwd.get('mask_up'), y['imgs'],
                    y['supp_imgs'], fwd['Ts'], Ks, rng=rng_k,
                    warp_bf16=self.warp_bf16)
                if 'disp_stereo' in fwd:
                    l2, ld2 = h.image_recon(
                        crit, fwd['depth_stereo_up'], fwd.get('mask_stereo_up'),
                        y['imgs_stereo'], y['imgs'][None],
                        rigid_inverse(y['T_stereo'])[None], Ks, rng=rng_k,
                        warp_bf16=self.warp_bf16)

            elif k == 'feat_recon':
                feat, supp_feat = self.extract_features(fwd, x, params, aux,
                                                        train=train)
                l, ld = h.feat_recon(
                    crit, fwd['depth_up'], fwd.get('mask_up'), feat, supp_feat,
                    fwd['Ts'], Ks, rng=rng_k)

            elif k == 'autoenc_recon':
                l, ld = h.autoenc_recon(
                    crit, fwd['autoenc_imgs_up'], y['imgs'],
                    fwd['supp_autoenc_imgs_up'], y['supp_imgs'])

            elif k == 'stereo_const':
                if 'disp_stereo' not in fwd:
                    raise KeyError('Missing virtual stereo prediction "disp_stereo".')
                l, ld = h.stereo_const(
                    crit, fwd['disp_up'], fwd['depth_up'],
                    fwd['disp_stereo_up'], fwd['depth_stereo_up'],
                    y['T_stereo'], Ks)

            elif k == 'depth_regr':
                if 'depth_hints' not in y:
                    raise KeyError('Missing proxy depth prediction "depth_hints".')
                l, ld = h.depth_regr(
                    crit, self.losses['img_recon'].compute_photo,
                    fwd['depth_up'], y['depth_hints'], y['imgs'], y['supp_imgs'],
                    fwd['Ts'], Ks)

            elif k == 'disp_smooth':
                l, ld = h.disp_smooth(crit, fwd['disp'], y['imgs'])
                if 'disp_stereo' in fwd:
                    l2, ld2 = h.disp_smooth(crit, fwd['disp_stereo'], y['imgs_stereo'])

            elif k in ('feat_peaky', 'feat_smooth'):
                l, ld = h.feat_smooth(
                    crit, fwd['autoenc_feats'], y['imgs'],
                    fwd['supp_autoenc_feats'], y['supp_imgs'])

            elif k == 'disp_occ':
                l, ld = h.disp_occ(crit, fwd['disp'])
                if 'disp_stereo' in fwd:
                    l = l + h.disp_occ(crit, fwd['disp_stereo'])[0]

            elif k == 'disp_mask':
                if 'mask' not in fwd:
                    raise KeyError('Missing masks in predictions.')
                l, ld = h.disp_mask(crit, fwd['mask'])
                if 'mask_stereo' in fwd:
                    l = l + h.disp_mask(crit, fwd['mask_stereo'])[0]

            else:
                raise ValueError(f'Missing loss key: "{k}"')

            loss = loss + self.weights[k] * l
            loss_dict[f'loss_{k}'] = l
            loss_dict.update(ld)

            if l2 is not None:
                loss = loss + self.weights[k] * l2
                loss_dict[f'loss_stereo_{k}'] = l2
                loss_dict.update({f'stereo_{kk}': v for kk, v in ld2.items()})

        return loss, loss_dict

    def extract_features(self, fwd: dict, x: dict, params, aux, train: bool = True):
        """Features for `feat_recon` (ref `trainer.py:475-484`); gradients are
        stopped inside the handler.

        The support-encoder pass runs in the same mode as the step (the
        reference's net stays in train mode under its `@torch.no_grad()`), so
        BatchNorm uses batch statistics. The running-stat update of this extra
        pass is discarded — torch would fold it in, but it only shifts
        eval-mode statistics, never the training trajectory."""
        if 'autoencoder' in self.nets:
            return fwd['autoenc_feats'], fwd['supp_autoenc_feats']
        feat = fwd['depth_feats']
        n, b = x['supp_imgs'].shape[:2]
        supp_flat = x['supp_imgs'].reshape((n * b,) + x['supp_imgs'].shape[2:])
        # Through _apply so the pass shares the step's precision (bf16 cast)
        # and batch-stat threading with the target encoder pass.
        supp_feat, _ = self._apply(
            'depth', params, aux, supp_flat, train,
            method=lambda m, xx, train: m.encoder(xx, train=train))
        supp_feat = [f.reshape((n, b) + f.shape[1:]) for f in supp_feat]
        return feat, supp_feat

    # ------------------------------------------------------------------- step
    def loss_fn(self, params, aux, x, y, supp_idxs: tuple, rng: jax.Array,
                train: bool = True):
        """Full differentiable step: forward -> postprocess -> loss."""
        rng_fwd, rng_loss = jax.random.split(rng)
        fwd, new_aux = self.forward(params, aux, x, supp_idxs, train)
        fwd = self.forward_postprocess(fwd, x, y, supp_idxs)
        loss, loss_dict = self.forward_loss(fwd, x, y, supp_idxs, rng_loss,
                                            params=params, aux=aux, train=train)
        return loss, (loss_dict, fwd, new_aux)

    def scalars(self, loss, loss_dict: dict, fwd: dict, y: dict) -> dict:
        """Scalar summaries for logging (ref `trainer.py:177-186,486-529`)."""
        out = {'loss': loss}
        out.update({k: v for k, v in loss_dict.items()
                    if k.startswith('loss_') and jnp.ndim(v) == 0})
        for s, d in fwd['disp_up'].items():
            out[f'disp_mean_{s}'] = d.mean()
        for s, d in fwd['depth_up'].items():
            out[f'depth_mean_{s}'] = d.mean()
        for k, v in fwd.items():
            if k.startswith('T_') and k != 'Ts':
                out[f'{k}_t_mean'] = jnp.sqrt((v[..., :3, 3] ** 2).sum(-1)).mean()
        if 'fs' in fwd:
            out['fx'], out['fy'] = fwd['fs'][..., 0].mean(), fwd['fs'][..., 1].mean()
            out['cx'], out['cy'] = fwd['cs'][..., 0].mean(), fwd['cs'][..., 1].mean()
        if 'depth' in y:
            pred = resize_like(fwd['depth_up'][min(fwd['depth_up'])], y['depth'])
            out.update(compute_train_metrics(
                jax.lax.stop_gradient(pred), y['depth'],
                self.min_depth or 0.1, self.max_depth or 100))
        return out

    # ------------------------------------------------------------------- init
    def init_state(self, rng: jax.Array, x: dict, supp_idxs: tuple,
                   tx: Optional[optax.GradientTransformation] = None) -> TrainState:
        """Initialize all network variables + optimizer state (host-side)."""
        params, aux = {}, {}
        keys = jax.random.split(rng, len(self.nets))
        for key_rng, (k, net) in zip(keys, self.nets.items()):
            # Init shapes don't need to match the train batch; batch size 1 keeps it cheap.
            dummy = x['imgs'][:1]
            in_chans = 3
            if k == 'pose':
                dummy = jnp.concatenate([dummy, dummy], axis=-1)
                in_chans = 6
            variables = dict(net.init(key_rng, dummy, train=False))

            # ImageNet-pretrained encoder weights (offline timm export; ref
            # `pretrained=True` semantics, `src/networks/depth.py:97`).
            if getattr(net, 'pretrained', False) and hasattr(net, 'enc_name'):
                from ..models.encoders.pretrained import load_pretrained_encoder
                variables = load_pretrained_encoder(variables, net.enc_name, in_chans)

            params[k] = variables.pop('params')
            aux[k] = variables  # batch_stats etc. (possibly empty)

        opt_state = tx.init(params) if tx is not None else None
        return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                          aux=aux, opt_state=opt_state,
                          bad_step=jnp.asarray(-1, jnp.int32))

    def make_step_fn(self, supp_idxs: tuple, tx: optax.GradientTransformation,
                     train: bool = True):
        """Build the (un-jitted) step function over `TrainState`.

        Jit/shard it via `parallel.make_train_step`, which owns the mesh
        placement and donation.
        """
        supp_idxs = tuple(supp_idxs)

        def step(state: TrainState, x: dict, y: dict, rng: jax.Array):
            if train:
                (loss, (ld, fwd, new_aux)), grads = jax.value_and_grad(
                    self.loss_fn, has_aux=True)(
                    state.params, state.aux, x, y, supp_idxs, rng, True)
                updates, new_opt = tx.update(grads, state.opt_state, state.params)
                new_params = optax.apply_updates(state.params, updates)
                bad = state.bad_step
                if bad is not None:
                    bad = jnp.where((bad < 0) & ~jnp.isfinite(loss),
                                    state.step, bad)
                new_state = state.replace(step=state.step + 1, params=new_params,
                                          aux=new_aux, opt_state=new_opt,
                                          bad_step=bad)
            else:
                loss, (ld, fwd, _) = self.loss_fn(
                    state.params, state.aux, x, y, supp_idxs, rng, False)
                new_state = state
            return new_state, self.scalars(loss, ld, fwd, y)

        return step
