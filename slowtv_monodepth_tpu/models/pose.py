"""Relative pose prediction network (ref `src/networks/pose.py:14-135`).

Encoder over a channel-concatenated image pair (in_chans=6) + 1x1 squeeze +
conv pose head -> axis-angle R and t scaled by pose_eps=0.01 (ref `:44,128`);
optional learned-intrinsics heads: softplus focal + sigmoid principal point
(ref `:86-106`), assembled by `build_K` (ref `:60-73`).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .. import register
from ..ops.dispatch import constrain_spatial
from .encoders import create_encoder

__all__ = ['PoseNet']


class _ConvReLU(nn.Module):
    out_ch: int
    kernel: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.relu(nn.Conv(self.out_ch, (self.kernel, self.kernel),
                               padding=self.padding, name='conv')(x))


class _Head(nn.Module):
    """Two conv3x3+ReLU blocks + 1x1 conv + global average pool."""
    out_ch: int

    @nn.compact
    def __call__(self, x):
        n_ch = x.shape[-1]
        x = _ConvReLU(n_ch, name='block0')(x)
        x = _ConvReLU(n_ch, name='block1')(x)
        x = nn.Conv(self.out_ch, (1, 1), name='out')(x)
        return x.mean(axis=(1, 2))  # (b, out_ch)


@register('pose')
class PoseNet(nn.Module):
    """:param enc_name: Encoder key.
    :param learn_K: If True, also predict normalized focal + principal point.
    :param pretrained: Kept for cfg parity (offline weight import).
    :param gelu: {'exact', 'tanh'} GELU flavor for GELU-based encoders.
    :param input_scale: Downsample factor for the pose input pair (1 = the
        reference behavior, full resolution). Pose/intrinsics regression is a
        global-pooled low-frequency task, but the encoder runs on 2x the
        depth batch (n_pairs x b images) at full resolution — on TPU it was
        ~28% of the whole KBR step (STATUS r02 profile: ~42 of 151 ms).
        `input_scale: 2` average-pools the pair 2x2 before the encoder,
        cutting pose-encoder FLOPs 4x. Opt-in deviation from the reference
        recipe; its trajectory effect is bounded by
        tests/test_recipe_deviation.py and it is NOT enabled in parity cfgs.
    """
    enc_name: str = 'resnet18'
    learn_K: bool = False
    pretrained: bool = False
    gelu: str = 'exact'
    input_scale: int = 1

    n_imgs: int = 2
    n_ch_dec: int = 256
    pose_eps: float = 0.01

    def setup(self):
        self.encoder, self.n_ch_enc, self.enc_sc = create_encoder(
            self.enc_name, in_chans=3 * self.n_imgs, gelu=self.gelu)
        self.squeeze = _ConvReLU(self.n_ch_dec, kernel=1, padding=0, name='squeeze')
        self.head_pose = _Head(6 * self.n_imgs, name='decoders_pose')
        if self.learn_K:
            self.head_focal = _Head(2, name='decoders_focal')
            self.head_offset = _Head(2, name='decoders_offset')

    @staticmethod
    def build_K(fs: jnp.ndarray, cs: jnp.ndarray) -> jnp.ndarray:
        """(b, 2) focal + (b, 2) principal point -> (b, 4, 4) intrinsics."""
        b = fs.shape[0]
        K = jnp.broadcast_to(jnp.eye(4, dtype=fs.dtype), (b, 4, 4))
        K = K.at[:, 0, 0].set(fs[:, 0])
        K = K.at[:, 1, 1].set(fs[:, 1])
        K = K.at[:, 0, 2].set(cs[:, 0])
        K = K.at[:, 1, 2].set(cs[:, 1])
        return K

    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict:
        """:param x: (b, h, w, 6) channel-concatenated image pair.
        :return: {R: (b, n_imgs, 3) axis-angle, t: (b, n_imgs, 3),
                  (opt) fs: (b, 2), cs: (b, 2)}.
        """
        if self.input_scale > 1:
            s = self.input_scale
            x = nn.avg_pool(x, (s, s), strides=(s, s))
        feat = self.encoder(x, train=train)
        # Same layout pin as DepthNet._forward (no-op outside a spatial
        # mesh): without it GSPMD height-shards deep pose stages whose
        # height is below the spatial axis size and the relu transpose pays
        # an involuntary full rematerialization (MULTICHIP_r04.json tail,
        # `transpose(jvp(PoseNet))/encoder/select_n`).
        feat = [constrain_spatial(f) for f in feat]
        feat = self.squeeze(feat[-1])

        out = self.pose_eps * self.head_pose(feat)  # (b, 6*n_imgs)
        out = out.reshape(-1, self.n_imgs, 6)
        res = {'R': out[..., :3], 't': out[..., 3:]}

        if self.learn_K:
            res['fs'] = nn.softplus(self.head_focal(feat))
            res['cs'] = nn.sigmoid(self.head_offset(feat))
        return res
