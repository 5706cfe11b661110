"""Swin Transformer feature-pyramid encoder (DPT `swinl12_384` family).

Capability parity with the reference's MiDaS Swin backbones
(`api/quickstart/networks/backbones/swin.py` + `swin_common.py`): 4 stages of
windowed attention with shifted windows, patch-merging downsampling, stage
outputs hooked as the natural [4, 8, 16, 32]-stride pyramid
(hooks `[1, 1, 17, 1]` = last block per stage).

TPU-first notes: window partitioning is pure reshape/transpose (layout-free
under XLA); attention runs as (num_windows*b, tokens, c) batched matmuls on
the MXU; the shifted-window attention mask is a trace-time constant.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ['SwinEncoder', 'SWIN_SPECS']

SWIN_SPECS = {
    'swinl12_384': dict(embed_dim=192, depths=(2, 2, 18, 2), heads=(6, 12, 24, 48),
                        window=12, channels=(192, 384, 768, 1536),
                        reductions=(4, 8, 16, 32)),
    'swint7_224': dict(embed_dim=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24),
                       window=7, channels=(96, 192, 384, 768),
                       reductions=(4, 8, 16, 32)),
    # SwinV2 (MiDaS 3.1 backbones, ref `api/quickstart/networks/backbones/
    # dpt.py:37-39`): cosine attention + log-CPB bias + post-norm residuals.
    'swin2l24_384': dict(embed_dim=192, depths=(2, 2, 18, 2), heads=(6, 12, 24, 48),
                         window=24, channels=(192, 384, 768, 1536),
                         reductions=(4, 8, 16, 32), v2=True),
    'swin2b24_384': dict(embed_dim=128, depths=(2, 2, 18, 2), heads=(4, 8, 16, 32),
                         window=24, channels=(128, 256, 512, 1024),
                         reductions=(4, 8, 16, 32), v2=True),
    'swin2t16_256': dict(embed_dim=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24),
                         window=16, channels=(96, 192, 384, 768),
                         reductions=(4, 8, 16, 32), v2=True),
}


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(b, h, w, c) -> (b*nw, w*w, c)."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_reverse(x: jnp.ndarray, w: int, h: int, ww: int) -> jnp.ndarray:
    """(b*nw, w*w, c) -> (b, h, w, c)."""
    b = x.shape[0] // ((h // w) * (ww // w))
    x = x.reshape(b, h // w, ww // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, ww, -1)


def _relative_position_index(w: int) -> np.ndarray:
    """(w*w, w*w) index into the (2w-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing='ij'))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(h: int, w: int, win: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: (nw, win*win, win*win) additive.

    Pure numpy (trace-time constant): jnp ops here would become tracers
    under jit and break the host-side window partition.
    """
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(h // win, win, w // win, win)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, win * win)  # (nw, win*win)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class _WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask=None):
        bnw, n, c = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, name='qkv')(x)
        qkv = qkv.reshape(bnw, n, 3, self.heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = (q @ k.transpose(0, 1, 3, 2)) * (head_dim ** -0.5)

        table = self.param('rel_pos_table', nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, self.heads))
        idx = _relative_position_index(self.window)
        bias = table[idx.reshape(-1)].reshape(n, n, self.heads).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.heads, n, n) + mask[None, :, None]
            attn = attn.reshape(bnw, self.heads, n, n)

        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bnw, n, self.dim)
        return nn.Dense(self.dim, name='proj')(out)


def _log_cpb_table(w: int) -> np.ndarray:
    """SwinV2 log-spaced continuous relative coords table: (2w-1, 2w-1, 2)."""
    rel = np.stack(np.meshgrid(np.arange(-(w - 1), w, dtype=np.float32),
                               np.arange(-(w - 1), w, dtype=np.float32),
                               indexing='ij'), axis=-1)
    rel = rel / max(w - 1, 1) * 8.0
    table = np.sign(rel) * np.log2(1.0 + np.abs(rel)) / np.log2(8.0)
    return table.astype(np.float32)


class _WindowAttentionV2(nn.Module):
    """SwinV2 windowed attention: cosine similarity with learned per-head
    temperature and a log-CPB MLP relative bias; q/v biased, k unbiased."""
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask=None):
        bnw, n, c = x.shape
        head_dim = self.dim // self.heads

        qkv_w = self.param('qkv_kernel', nn.initializers.lecun_normal(),
                           (c, self.dim * 3))
        q_bias = self.param('q_bias', nn.initializers.zeros, (self.dim,))
        v_bias = self.param('v_bias', nn.initializers.zeros, (self.dim,))
        bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = (x @ qkv_w + bias).reshape(bnw, n, 3, self.heads, head_dim)
        q, k, v = qkv.transpose(2, 0, 3, 1, 4)

        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        logit_scale = self.param('logit_scale',
                                 nn.initializers.constant(np.log(10.0)),
                                 (self.heads, 1, 1))
        scale = jnp.exp(jnp.clip(logit_scale, None, np.log(100.0)))
        attn = (q @ k.transpose(0, 1, 3, 2)) * scale[None]

        table = jnp.asarray(_log_cpb_table(self.window)).reshape(-1, 2)
        h = nn.Dense(512, name='cpb_fc1')(table)
        h = nn.Dense(self.heads, use_bias=False, name='cpb_fc2')(nn.relu(h))
        idx = _relative_position_index(self.window)
        rel = 16.0 * nn.sigmoid(h)[idx.reshape(-1)]
        attn = attn + rel.reshape(n, n, self.heads).transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.heads, n, n) + mask[None, :, None]
            attn = attn.reshape(bnw, self.heads, n, n)
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bnw, n, self.dim)
        return nn.Dense(self.dim, name='proj')(out)


class _SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    # 'timm' clamps the window to the input and disables shift when a single
    # window covers it; 'mmseg' (NeWCRFs' vendored Swin) keeps the configured
    # window/shift and relies on padding + the attention mask.
    style: str = 'timm'
    v2: bool = False  # SwinV2: cosine attention + log-CPB bias + post-norm.

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if self.style == 'timm':
            win = min(self.window, h, w)
            shift = self.shift if win < min(h, w) else 0
        else:
            win, shift = self.window, self.shift

        # V1 pre-norms; V2 norms the attention OUTPUT (post-norm residual).
        y = x if self.v2 else nn.LayerNorm(epsilon=1e-5, name='norm1')(x)
        # Pad to window multiples BEFORE the cyclic shift (both timm and
        # mmseg pad first; the order matters for non-multiple inputs).
        ph = (win - h % win) % win
        pw = (win - w % win) % win
        if ph or pw:
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        wins = _window_partition(y, win)
        mask = jnp.asarray(_shift_mask(hp, wp, win, shift)) if shift else None
        attn_cls = _WindowAttentionV2 if self.v2 else _WindowAttention
        wins = attn_cls(self.dim, self.heads, win, name='attn')(wins, mask)
        y = _window_reverse(wins, win, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w]
        if self.v2:
            y = nn.LayerNorm(epsilon=1e-5, name='norm1')(y)
        x = x + y

        y = x if self.v2 else nn.LayerNorm(epsilon=1e-5, name='norm2')(x)
        y = nn.Dense(4 * self.dim, name='fc1')(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name='fc2')(y)
        if self.v2:
            y = nn.LayerNorm(epsilon=1e-5, name='norm2')(y)
        return x + y


class SwinEncoder(nn.Module):
    """:param embed_dim/depths/heads/window: Swin trunk configuration.
    Inputs must be multiples of `4 * window` (e.g. 48 for window 12)."""
    embed_dim: int = 192
    depths: Sequence[int] = (2, 2, 18, 2)
    heads: Sequence[int] = (6, 12, 24, 48)
    window: int = 12
    in_chans: int = 3
    out_norms: bool = False  # Per-stage output LayerNorms (mmseg-Swin style).
    style: str = 'timm'      # Block shift semantics; see `_SwinBlock.style`.
    v2: bool = False         # SwinV2 blocks + post-merge norm ordering.

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list:
        b, h, w, _ = x.shape
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), name='patch_embed')(x)
        x = nn.LayerNorm(epsilon=1e-5, name='patch_norm')(x)

        feats = []
        dim = self.embed_dim
        for s, (depth, heads) in enumerate(zip(self.depths, self.heads)):
            if s > 0:
                # Patch merging: 2x2 concat + linear reduce (odd dims padded,
                # as in timm).
                b_, hh, ww, c = x.shape
                if hh % 2 or ww % 2:
                    x = jnp.pad(x, ((0, 0), (0, hh % 2), (0, ww % 2), (0, 0)))
                    b_, hh, ww, c = x.shape
                x = x.reshape(b_, hh // 2, 2, ww // 2, 2, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b_, hh // 2, ww // 2, 4 * c)
                if self.v2:  # V2 swaps: reduce THEN norm (post-norm).
                    x = nn.Dense(2 * c, use_bias=False, name=f'merge{s}_reduce')(x)
                    x = nn.LayerNorm(epsilon=1e-5, name=f'merge{s}_norm')(x)
                else:
                    x = nn.LayerNorm(epsilon=1e-5, name=f'merge{s}_norm')(x)
                    x = nn.Dense(2 * c, use_bias=False, name=f'merge{s}_reduce')(x)
                dim *= 2
            for i in range(depth):
                shift = 0 if i % 2 == 0 else self.window // 2
                x = _SwinBlock(dim, heads, self.window, shift,
                               style=self.style, v2=self.v2,
                               name=f'stage{s}_block{i}')(x)
            feats.append(nn.LayerNorm(epsilon=1e-5, name=f'out_norm{s}')(x)
                         if self.out_norms else x)
        return feats
