"""MobileViT-S (Flax, from scratch).

The reference instantiates timm's ``mobilevit_s`` with an overridden
img_size (``/root/reference/models/mobile_vit.py:23-28``; configs force
input_size 224). This is a first-party Flax implementation of that
architecture (Mehta & Rastegari, ICLR 2022): conv stem, MobileNetV2
inverted-residual blocks (expansion 4, SiLU, BatchNorm), and three MobileViT
blocks that unfold feature maps into 2x2 patch grids, run pre-norm
transformers (dims 144/192/240, depths 2/4/3, 4 heads, mlp ratio 2) across
patch positions, fold back, and fuse with a 3x3 conv. Head: 1x1 conv to 640,
global average pool, linear classifier.

TPU notes: NHWC layout throughout; unfold/fold are static reshape/transpose
chains; when a stage resolution is not divisible by the patch size the map
is bilinearly resized to the ceiling multiple and back (timm behavior — hits
the 7x7 stage at 224 input). BatchNorm statistics live in the standard flax
``batch_stats`` collection (threaded through the classifier train step).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vitsom_tpu.config import Config

BN_MOMENTUM = 0.9  # = 1 - torch momentum 0.1
BN_EPS = 1e-5
LN_EPS = 1e-6  # timm mobilevit transformer LayerNorm eps


class ConvBnSiLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        # flax BatchNorm computes mean/var statistics in f32 regardless of
        # dtype (promote in _compute_stats); running stats stay f32 params
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype,
        )(x)
        return nn.silu(x)


class MV2Block(nn.Module):
    """MobileNetV2 inverted residual: 1x1 expand -> 3x3 depthwise -> 1x1
    project (linear), residual when stride 1 and channels match."""

    features: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inp = x.shape[-1]
        hidden = inp * self.expansion
        y = ConvBnSiLU(hidden, kernel=1, dtype=self.dtype)(x, deterministic)
        y = ConvBnSiLU(
            hidden, kernel=3, stride=self.stride, groups=hidden,
            dtype=self.dtype,
        )(y, deterministic)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(
            use_running_average=deterministic, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype,
        )(y)
        if self.stride == 1 and inp == self.features:
            y = x + y
        return y


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int = 4
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [..., N, dim]; pre-norm MHSA + MLP (SiLU, per timm mobilevit)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            deterministic=True, dtype=self.dtype,
        )(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


def _unfold(x: jnp.ndarray, p: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """[B, H, W, d] -> [B, p*p, (H/p)*(W/p), d] (per-pixel-position groups)."""
    b, h, w, d = x.shape
    x = x.reshape(b, h // p, p, w // p, p, d)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, p, p, h/p, w/p, d]
    return x.reshape(b, p * p, (h // p) * (w // p), d), (h, w)


def _fold(x: jnp.ndarray, p: int, hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = hw
    b = x.shape[0]
    d = x.shape[-1]
    x = x.reshape(b, p, p, h // p, w // p, d)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, h, w, d)


class MobileViTBlock(nn.Module):
    channels: int
    transformer_dim: int
    depth: int
    patch_size: int = 2
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = self.patch_size
        residual = x

        # local representation
        y = ConvBnSiLU(self.channels, kernel=3, dtype=self.dtype)(
            x, deterministic
        )
        y = nn.Conv(
            self.transformer_dim, (1, 1), use_bias=False, dtype=self.dtype
        )(y)

        # resize to patch multiples when needed (timm: 7x7 stage at 224)
        b, h, w, d = y.shape
        nh, nw = math.ceil(h / p) * p, math.ceil(w / p) * p
        resized = (nh, nw) != (h, w)
        if resized:
            y = jax.image.resize(y, (b, nh, nw, d), method="bilinear")

        tokens, hw = _unfold(y, p)
        for _ in range(self.depth):
            tokens = TransformerBlock(
                self.transformer_dim, mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
            )(tokens)
        tokens = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(tokens)
        y = _fold(tokens, p, hw)
        if resized:
            y = jax.image.resize(y, (b, h, w, d), method="bilinear")

        # project back + fuse with the residual input
        y = ConvBnSiLU(self.channels, kernel=1, dtype=self.dtype)(
            y, deterministic
        )
        y = jnp.concatenate([residual, y], axis=-1)
        y = ConvBnSiLU(self.channels, kernel=3, dtype=self.dtype)(
            y, deterministic
        )
        return y


class MobileViTS(nn.Module):
    """mobilevit_s: stem 16; stages (32), (64 x3 s2), (96 + ViT d2/144),
    (128 + ViT d4/192), (160 + ViT d3/240); head conv 640 -> pool -> fc."""

    num_classes: int = 1000
    dtype: Any = jnp.float32  # compute dtype; params/BN stats stay f32
    # rematerialize every block in the backward pass: at the reference's
    # input_size=224 / batch 128 the stored conv residuals are ~7 GB and the
    # compiled epoch program crashed the v5e worker at first execution
    # (family_bench mobile_vit log, r5); remat trades that for replay FLOPs
    remat: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dt = self.dtype
        if self.remat:
            # deterministic (arg 2 incl. the module) is a static bool
            CBS = nn.remat(ConvBnSiLU, static_argnums=(2,))
            MV2 = nn.remat(MV2Block, static_argnums=(2,))
            MVB = nn.remat(MobileViTBlock, static_argnums=(2,))
        else:
            CBS, MV2, MVB = ConvBnSiLU, MV2Block, MobileViTBlock
        x = CBS(16, kernel=3, stride=2, dtype=dt)(x, deterministic)
        x = MV2(32, stride=1, dtype=dt)(x, deterministic)

        x = MV2(64, stride=2, dtype=dt)(x, deterministic)
        x = MV2(64, stride=1, dtype=dt)(x, deterministic)
        x = MV2(64, stride=1, dtype=dt)(x, deterministic)

        x = MV2(96, stride=2, dtype=dt)(x, deterministic)
        x = MVB(96, 144, depth=2, dtype=dt)(x, deterministic)

        x = MV2(128, stride=2, dtype=dt)(x, deterministic)
        x = MVB(128, 192, depth=4, dtype=dt)(x, deterministic)

        x = MV2(160, stride=2, dtype=dt)(x, deterministic)
        x = MVB(160, 240, depth=3, dtype=dt)(x, deterministic)

        x = ConvBnSiLU(640, kernel=1, dtype=dt)(x, deterministic)
        # pool + head in f32 so logits/CE keep full precision
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


def build_mobilevit_s(cfg: Config) -> MobileViTS:
    """From config (reference forces input_size 224 in the mobile_vit
    configs; any multiple of 2 works here). ``train.compute_dtype:
    bfloat16`` switches conv/transformer compute to bf16 mixed precision
    (params, BN running stats, pool/head stay f32), mirroring the other
    families' opt-in."""
    dtype = (
        jnp.bfloat16
        if cfg.train.compute_dtype == "bfloat16"
        else jnp.float32
    )
    return MobileViTS(
        num_classes=cfg.data.num_classes,
        dtype=dtype,
        remat=cfg.train.remat_blocks,
    )
