"""Flax ViT autoencoder (MAE-style, unmasked).

TPU-native re-design of the reference ViT autoencoder
(``/root/reference/models/vit.py:16-240``): encoder = PatchEmbed conv +
fixed 2D sincos positional table + CLS token + pre-norm transformer blocks;
decoder = linear embed + sincos + blocks + per-patch pixel head + unpatchify.

Differences from the reference that are deliberate TPU choices:
- images are NHWC (TPU conv layout), so patchify/unpatchify transpose
  accordingly while preserving the reference's (p, q, c) intra-patch order
  (``models/vit.py:127-153``);
- attention is pluggable: the default XLA path lets the compiler fuse the
  two batched matmuls + softmax; a Pallas fused kernel can be selected via
  ``attn_impl='pallas'`` (see ``vitsom_tpu/ops/attention.py``);
- the frozen sincos tables are compile-time constants, not buffers.

The reference's custom ``Block`` ignores its configs' ``drop_path`` and all
dropout knobs are 0 in every shipped config (``models/vit.py:45-63``), so
blocks here are deterministic.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vitsom_tpu.ops.pos_embed import get_2d_sincos_pos_embed
from vitsom_tpu.ops import attention as attention_ops
from vitsom_tpu.utils.initializers import (
    conv_xavier_as_linear,
    torch_default_bias,
    trunc_or_normal,
    xavier_uniform,
)

LN_EPS = 1e-6  # reference uses partial(nn.LayerNorm, eps=1e-6)


def patchify(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, h*w, p*p*C] with (p, q, c) intra-patch order,
    matching reference ``patchify`` (``models/vit.py:127-139``)."""
    b, hh, ww, c = imgs.shape
    p = patch_size
    h, w = hh // p, ww // p
    x = imgs.reshape(b, h, p, w, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, h, w, p, q, c]
    return x.reshape(b, h * w, p * p * c)


def unpatchify(x: jnp.ndarray, patch_size: int, channels: int) -> jnp.ndarray:
    """[B, h*w, p*p*C] -> [B, H, W, C] (reference ``models/vit.py:141-153``)."""
    b, n, _ = x.shape
    p = patch_size
    h = w = int(round(n**0.5))
    assert h * w == n, "non-square patch grid"
    x = x.reshape(b, h, w, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, h, p, w, q, c]
    return x.reshape(b, h * p, w * p, channels)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, kernel_init=xavier_uniform(), bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default is exact erf
        x = nn.Dense(self.out_dim, kernel_init=xavier_uniform(), bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    # one of config.py's valid_impls: "xla" | "pallas" | "hybrid" |
    # "xla_bf16" | "xla_bf16s" (see ops/attention.multi_head_attention)
    attn_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_attn: bool = False):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        # QKV projection layout is dim-adaptive (both measured on v5e):
        # - dim >= 128: three separate q/k/v projections instead of the
        #   reference's fused qkv Linear (``models/vit.py:23``) — slicing
        #   the packed [B, N, 3, H, hd] tensor forced a per-block 5-D
        #   relayout copy + three strided slices (profiled at ~11% of the
        #   emb-192 CIFAR cls step; 192 is not lane-tile aligned, so
        #   minor-dim splits copy too). Each dot feeds the attention einsum
        #   directly. Init parity: kernels draw from the SAME xavier-uniform
        #   distribution the fused [C, 3*dim] matrix would (fan_avg scaled
        #   by (c+dim)/(c+3*dim)).
        # - dim < 128 (sub-lane-width): one fused matmul wins — the
        #   relayout copy is negligible at these sizes (~0.4 MB at emb 16)
        #   while three separate sub-tile matmuls pad 3x the lanes
        #   (family-bench A/B at emb 16: 86.1k img/s fused vs 80.6k split).
        if self.dim >= 128:
            fused_fan_init = nn.initializers.variance_scaling(
                (c + self.dim) / (c + 3 * self.dim), "fan_avg", "uniform"
            )
            q, k, v = (
                nn.Dense(
                    self.dim,
                    use_bias=self.qkv_bias,
                    kernel_init=fused_fan_init,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype,
                    name=nm,
                )(x).reshape(b, n, self.num_heads, head_dim)
                for nm in ("query", "key", "value")
            )
        else:
            qkv = nn.Dense(
                self.dim * 3,
                use_bias=self.qkv_bias,
                kernel_init=xavier_uniform(),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
            )(x)
            qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        out, attn = attention_ops.multi_head_attention(
            q, k, v, impl=self.attn_impl, return_attn=return_attn
        )

        out = out.reshape(b, n, c).astype(self.dtype)
        out = nn.Dense(
            self.dim, kernel_init=xavier_uniform(), bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(out)
        return out, attn


class Block(nn.Module):
    """Pre-norm transformer block (reference ``models/vit.py:45-63``)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attn_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_attn: bool = False):
        # LayerNorm statistics in f32 (dtype=f32 default upcasts internally);
        # matmul-heavy paths run in self.dtype (bf16 mixed-precision mode)
        y, attn = Attention(
            self.dim, self.num_heads, qkv_bias=self.qkv_bias,
            attn_impl=self.attn_impl, dtype=self.dtype,
        )(nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x), return_attn=return_attn)
        x = x + y
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype)(
            nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)
        )
        return x, attn


class ViTAutoencoder(nn.Module):
    """Unmasked MAE-style autoencoder (reference ``models/vit.py:65-240``)."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    attn_impl: str = "xla"
    remat: bool = False  # rematerialize blocks in bwd (see TrainConfig)
    dtype: Any = jnp.float32  # compute dtype; params stay f32

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def setup(self):
        grid = self.img_size // self.patch_size
        # frozen sincos tables — compile-time constants (reference buffers,
        # ``models/vit.py:80,89,100-106``)
        self._pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dim, grid, cls_token=True)[None]
        )
        self._dec_pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(self.decoder_embed_dim, grid, cls_token=True)[None]
        )

        self.patch_proj = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            kernel_init=conv_xavier_as_linear(),
            bias_init=torch_default_bias(self.in_chans * self.patch_size**2),
            dtype=self.dtype,
        )
        self.cls_token = self.param(
            "cls_token", trunc_or_normal(0.02), (1, 1, self.embed_dim)
        )
        # static_argnums: return_attn is a Python bool controlling trace-time
        # structure; letting remat trace it breaks the bool conversion inside
        # the attention op (argnum 2 = self, x, return_attn).
        # Full remat (save only block inputs) measured FASTER than a
        # save_only_these_names('attn_probs') policy (2.07 vs 2.35 ms/step on
        # v5e): keeping the [B, H, N, N] probs as a residual adds a
        # write+read of N^2 traffic that costs more than replaying the
        # QK^T+softmax chain inside the fused backward.
        block_cls = nn.remat(Block, static_argnums=(2,)) if self.remat else Block
        self.blocks = [
            block_cls(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                attn_impl=self.attn_impl,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            for i in range(self.depth)
        ]
        self.encoder_norm = nn.LayerNorm(epsilon=LN_EPS)

        self.decoder_embed = nn.Dense(
            self.decoder_embed_dim, kernel_init=xavier_uniform(),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
        )
        self.decoder_blocks = [
            block_cls(
                self.decoder_embed_dim,
                self.decoder_num_heads,
                self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                attn_impl=self.attn_impl,
                dtype=self.dtype,
                name=f"dec_block_{i}",
            )
            for i in range(self.decoder_depth)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=LN_EPS)
        self.decoder_pred = nn.Dense(
            self.patch_size**2 * self.in_chans,
            kernel_init=xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )

    # --- encoder ---

    def encode_tokens(self, x, return_attns: bool = False):
        """[B, H, W, C] -> token sequence [B, 1+N, D] after final norm."""
        x = self.patch_proj(x)  # [B, h, w, D]
        b = x.shape[0]
        x = x.reshape(b, -1, self.embed_dim)
        # cast the f32 sincos table to the compute dtype at the point of use:
        # adding it raw promotes the RESIDUAL STREAM (and every block's
        # residual add / LN input / backward residual after it) to f32 —
        # profiled at ~16% of the bf16 cls step as f32-activation dot fusions
        x = x + self._pos_embed[:, 1:, :].astype(self.dtype)

        cls = (self.cls_token + self._pos_embed[:, :1, :]).astype(self.dtype)
        cls = jnp.broadcast_to(cls, (b, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)

        attns = [] if return_attns else None
        for blk in self.blocks:
            x, attn = blk(x, return_attns)  # positional: remat static_argnums
            if return_attns and attn is not None:
                attns.append(attn)
        x = self.encoder_norm(x)
        return x.astype(jnp.float32), attns

    def forward_features(self, x, return_attns: bool = False):
        """CLS-token features (reference ``models/vit.py:155-179``)."""
        tokens, attns = self.encode_tokens(x, return_attns)
        return tokens[:, 0], attns

    # --- decoder ---

    def forward_decoder(self, tokens, return_attn: bool = False):
        """Token sequence [B, 1+N, D] -> per-patch pixel predictions
        [B, N, p*p*C] (reference ``models/vit.py:182-200``)."""
        d = self.decoder_embed(tokens)
        d = d + self._dec_pos_embed.astype(self.dtype)  # keep the stream in
        # the compute dtype (see encode_tokens)
        attns = [] if return_attn else None
        for blk in self.decoder_blocks:
            d, attn = blk(d, return_attn)  # positional: remat static_argnums
            if return_attn and attn is not None:
                attns.append(attn)
        d = self.decoder_norm(d)
        pred = self.decoder_pred(d)[:, 1:, :].astype(jnp.float32)
        return pred, attns

    # --- full autoencoder ---

    def __call__(self, x, return_attns: bool = False):
        """Returns (cls_token, patch_tokens, recon_img[, attns]) matching
        reference ``forward`` (``models/vit.py:202-240``); recon is NHWC."""
        tokens, attns = self.encode_tokens(x, return_attns)
        cls_out = tokens[:, 0]
        patch_out = tokens[:, 1:]

        pred, _ = self.forward_decoder(tokens, return_attn=False)
        recon = unpatchify(pred, self.patch_size, self.in_chans)

        if return_attns:
            return cls_out, patch_out, recon, attns
        return cls_out, patch_out, recon


def build_vit_autoencoder(cfg, attn_impl: str = "xla") -> ViTAutoencoder:
    """Construct from a ``Config`` (mirrors reference ctor wiring at
    ``models/vit_som.py:39-52``; decoder_num_heads = encoder heads there).

    ``train.compute_dtype: bfloat16`` switches block compute to bf16 mixed
    precision (params, LN statistics, softmax, SOM, and losses stay f32).
    """
    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    return ViTAutoencoder(
        img_size=cfg.data.input_size,
        patch_size=cfg.vit.patch_size,
        in_chans=cfg.data.num_channels,
        embed_dim=cfg.vit.emb_dim,
        depth=cfg.vit.depth,
        num_heads=cfg.vit.heads,
        decoder_embed_dim=cfg.vit.dec_emb_dim,
        decoder_depth=cfg.vit.dec_depth,
        decoder_num_heads=cfg.vit.heads,
        mlp_ratio=float(cfg.vit.mlp_ratio),
        qkv_bias=cfg.vit.qkv_bias,
        attn_impl=attn_impl,
        remat=cfg.train.remat_blocks,
        dtype=dtype,
    )


class ClsHead(nn.Module):
    """Linear classifier head with N(0, .02) weights and torch-default bias
    (reference ``models/vit_som.py:58-59``, ``models/vit.py:276-277``)."""

    num_classes: int
    in_dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.num_classes,
            kernel_init=trunc_or_normal(0.02),
            bias_init=torch_default_bias(self.in_dim),
        )(x)
