"""Swin Transformer (Flax, from scratch).

The reference instantiates timm's ``swin_tiny_patch4_window7_224`` with
overridden img/patch/window/dims (``/root/reference/models/swin.py:23-33``).
This is a first-party Flax implementation of that architecture: patch embed,
window attention with relative position bias, shifted windows with the
attention mask, patch merging between stages, stochastic depth, LayerNorm +
mean-pool head. Odd resolutions (e.g. medmnist 28/4 = 7x7 with window 4) are
handled by padding to window multiples / even dims, as timm does.

TPU notes: windows are extracted with reshapes/transposes (static shapes) so
attention runs as one batched [B*nW, heads, w*w, w*w] matmul chain on the
MXU; the roll for shifted windows is a lax-level rotate.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vitsom_tpu.config import Config
from vitsom_tpu.ops import attention as attention_ops
from vitsom_tpu.utils.initializers import trunc_or_normal

LN_EPS = 1e-5  # timm swin uses default LayerNorm eps


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, w*w, C]."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def window_reverse(x: jnp.ndarray, w: int, h: int, ww: int) -> jnp.ndarray:
    """[B*nW, w*w, C] -> [B, H, W, C]."""
    b = x.shape[0] // ((h // w) * (ww // w))
    x = x.reshape(b, h // w, ww // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, ww, -1)


def relative_position_index(w: int) -> np.ndarray:
    """[w*w, w*w] index into the (2w-1)^2 relative-bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [2, n, n]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[:, :, 0] * (2 * w - 1) + rel[:, :, 1]).astype(np.int32)


def shift_attn_mask(h: int, w_dim: int, window: int, shift: int) -> np.ndarray:
    """[nW, w*w, w*w] additive mask (-100 for cross-region pairs) for
    shifted-window attention.

    Pure numpy: this is a compile-time constant and may be built inside a
    traced __call__ — routing it through jnp turns it into a tracer and
    breaks under jit."""
    img_mask = np.zeros((1, h, w_dim, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    x = img_mask.reshape(1, h // window, window, w_dim // window, window, 1)
    mw = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


# structural mask value for cross-window pairs in the dense formulation:
# exp(-1e9 - rowmax) underflows to EXACTLY 0 in both f32 and bf16 softmax,
# so a masked pair contributes nothing — the same result as never putting
# the pair in a window matmul at all.
_DENSE_NEG = -1.0e9


@lru_cache(maxsize=None)
def dense_attn_constants(
    h: int, w_dim: int, window: int, shift: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Compile-time constants for DENSE-MASKED window attention.

    TPU-native reformulation of (shifted) window attention: instead of
    roll + 6-D partition/reverse transposes + thousands of tiny [w*w, hd]
    batched matmuls (profiled at 51% of the Swin train step on v5e, round 4),
    each block runs ONE plain [B, H, N, N] attention over the unrolled token
    sequence with a static additive mask that reproduces the window
    structure exactly:

    - pairs in different (shifted) windows get -1e9 -> softmax weight exactly
      0, identical to being excluded from the window matmul;
    - pairs in the same window but different shift regions get the
      reference's -100 quirk value (``shift_attn_mask`` /
      ``/root/reference/models/swin.py`` via timm's SwinBlock);
    - ``bias_idx`` maps every same-window pair to its relative-position
      entry in the (2w-1)^2 trainable table (masked pairs point at entry 0,
      which the -1e9 makes irrelevant).

    The extra score FLOPs (N^2 vs nW*(w*w)^2) are MXU-friendly and tiny at
    these resolutions; the eliminated transposes/copies are not. Requires
    divisible resolutions (h % window == w % window == 0); SwinBlock falls
    back to the windowed path otherwise (e.g. medmnist 7x7 with window 4,
    where timm-style zero-padded keys participate in the softmax and the
    dense form would not reproduce that).

    Returns (mask [N, N] f32, bias_idx [N, N] int32) for N = h * w_dim.
    """
    assert h % window == 0 and w_dim % window == 0
    ys, xs = np.mgrid[0:h, 0:w_dim]
    # token (y, x) sits at rolled coords (yr, xr) after roll(-shift, -shift)
    yr = (ys - shift) % h
    xr = (xs - shift) % w_dim
    wid = ((yr // window) * (w_dim // window) + (xr // window)).ravel()
    same = wid[:, None] == wid[None, :]
    mask = np.where(same, 0.0, _DENSE_NEG).astype(np.float32)
    if shift:
        # reference -100 between different regions within a shifted window
        region_img = np.zeros((h, w_dim), np.float32)
        cnt = 0
        sl = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
        for hs in sl:
            for ws in sl:
                region_img[hs, ws] = cnt
                cnt += 1
        region = region_img[yr, xr].ravel()
        cross = same & (region[:, None] != region[None, :])
        mask = np.where(cross, -100.0, mask).astype(np.float32)
    iy = (yr % window).ravel()
    ix = (xr % window).ravel()
    rel = (
        (iy[:, None] - iy[None, :] + window - 1) * (2 * window - 1)
        + (ix[:, None] - ix[None, :] + window - 1)
    )
    bias_idx = np.where(same, rel, 0).astype(np.int32)
    return mask, bias_idx


class DropPath(nn.Module):
    """Stochastic depth (per-sample residual drop), timm semantics."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate <= 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class WindowAttention(nn.Module):
    """(Shifted-)window attention, two execution paths over ONE param tree
    (Dense_0 qkv -> rel_bias_table -> Dense_1 proj, so checkpoints are
    path-independent):

    - ``dense`` path (default for window-divisible resolutions): x is the
      full unrolled [B, N, C] token sequence and window structure comes in
      as a static additive mask + bias-index matrix (``dense_attn_constants``)
      applied inside one plain multi-head attention — the TPU-fast form
      (no roll / partition / reverse transposes, MXU-shaped matmuls, and the
      validated ``attn_impl`` score-dtype recipes apply).
    - windowed path (``mask`` arg, non-divisible resolutions): x is
      [B*nW, w*w, C] with the classic per-window batched attention.
    """

    dim: int
    window: int
    num_heads: int
    attn_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        mask: Optional[jnp.ndarray] = None,
        dense: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ):
        bnw, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5
        qkv = nn.Dense(
            self.dim * 3, use_bias=True, kernel_init=trunc_or_normal(0.02),
            dtype=self.dtype,
        )(x)

        table = self.param(
            "rel_bias_table",
            trunc_or_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )

        if dense is not None:
            dense_mask, bias_idx = dense  # [N, N] f32 / int32 numpy consts
            qkv = qkv.reshape(bnw, n, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B,N,H,hd]
            # [H, N, N] = per-head relative bias gathered over the full
            # sequence + window/shift mask, one static-index take per step
            bias = jnp.take(
                table.T, jnp.asarray(bias_idx.ravel()), axis=1
            ).reshape(self.num_heads, n, n)
            bias = bias + jnp.asarray(dense_mask)[None]
            out, _ = attention_ops.multi_head_attention(
                q, k, v, impl=self.attn_impl, bias=bias
            )
            out = out.reshape(bnw, n, c).astype(self.dtype)
            return nn.Dense(
                self.dim, kernel_init=trunc_or_normal(0.02), dtype=self.dtype
            )(out)

        qkv = qkv.reshape(bnw, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [bnw, H, n, hd]

        # scores accumulate in f32 regardless of compute dtype (the windows
        # are tiny, n<=16 — softmax/bias math stays f32 for free)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale  # [bnw, H, n, n] f32

        idx = jnp.asarray(relative_position_index(self.window))
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None, :, :]
            attn = attn.reshape(bnw, self.num_heads, n, n)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn, v.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(
            self.dim, kernel_init=trunc_or_normal(0.02), dtype=self.dtype
        )(out)


class SwinBlock(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    attn_impl: str = "xla"
    force_windowed: bool = False  # test oracle: run the windowed path even
    # when the dense-masked formulation applies (parity tests)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h, w_dim = self.input_resolution
        window = min(self.window, h, w_dim)
        shift = 0 if window >= min(h, w_dim) else self.shift

        b, n, c = x.shape
        shortcut = x
        # LN statistics compute in f32 internally; output in compute dtype
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)

        if h % window == 0 and w_dim % window == 0 and not self.force_windowed:
            # dense-masked window attention (see dense_attn_constants): the
            # token sequence never leaves [B, N, C] — no roll, no 6-D
            # partition/reverse transposes. Window structure (incl. the
            # shifted-window region quirk) is an additive mask constant.
            x = WindowAttention(
                self.dim, window, self.num_heads,
                attn_impl=self.attn_impl, dtype=self.dtype,
            )(x, dense=dense_attn_constants(h, w_dim, window, shift))
        else:
            # windowed fallback for non-divisible resolutions (e.g. medmnist
            # 7x7 with window 4): zero-padded tokens participate as keys,
            # exactly as timm's padding does — the dense mask cannot
            # reproduce that, so this path is kept verbatim.
            x = x.reshape(b, h, w_dim, c)
            pad_h = (window - h % window) % window
            pad_w = (window - w_dim % window) % window
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            hp, wp = h + pad_h, w_dim + pad_w

            if shift > 0:
                x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
                mask = jnp.asarray(shift_attn_mask(hp, wp, window, shift))
            else:
                mask = None

            xw = window_partition(x, window)
            xw = WindowAttention(
                self.dim, window, self.num_heads,
                attn_impl=self.attn_impl, dtype=self.dtype,
            )(xw, mask)
            x = window_reverse(xw, window, hp, wp)

            if shift > 0:
                x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
            if pad_h or pad_w:
                x = x[:, :h, :w_dim, :]
            x = x.reshape(b, n, c)

        x = shortcut + DropPath(self.drop_path)(x, deterministic)
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)
        y = nn.Dense(
            int(self.dim * self.mlp_ratio), kernel_init=trunc_or_normal(0.02),
            dtype=self.dtype,
        )(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(
            self.dim, kernel_init=trunc_or_normal(0.02), dtype=self.dtype
        )(y)
        return x + DropPath(self.drop_path)(y, deterministic)


class PatchMerging(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w_dim = self.input_resolution
        b, n, c = x.shape
        x = x.reshape(b, h, w_dim, c)
        if h % 2 or w_dim % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w_dim % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = x.reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)
        return nn.Dense(
            2 * self.dim, use_bias=False, kernel_init=trunc_or_normal(0.02),
            dtype=self.dtype,
        )(x)


class SwinTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    attn_impl: str = "xla"
    force_windowed: bool = False
    dtype: Any = jnp.float32  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            kernel_init=trunc_or_normal(0.02),
            dtype=self.dtype,
        )(x)
        b, h, w_dim, c = x.shape
        x = x.reshape(b, h * w_dim, c)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)

        total_blocks = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_blocks)
        blk = 0
        res = (h, w_dim)
        dim = self.embed_dim
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for i in range(depth):
                x = SwinBlock(
                    dim=dim,
                    input_resolution=res,
                    num_heads=heads,
                    window=self.window,
                    shift=0 if i % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=float(dpr[blk]),
                    attn_impl=self.attn_impl,
                    force_windowed=self.force_windowed,
                    dtype=self.dtype,
                )(x, deterministic)
                blk += 1
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, res, dtype=self.dtype)(x)
                res = ((res[0] + 1) // 2, (res[1] + 1) // 2)
                dim *= 2

        # final LN / pool / head in f32 (default-dtype modules upcast the
        # bf16 stream) so logits and the CE loss keep full precision
        x = nn.LayerNorm(epsilon=LN_EPS)(x)
        x = x.mean(axis=1)  # global average pool
        return nn.Dense(self.num_classes, kernel_init=trunc_or_normal(0.02))(x)


def build_swin(cfg: Config, attn_impl: Optional[str] = None) -> SwinTransformer:
    """``train.compute_dtype: bfloat16`` switches block compute to bf16
    mixed precision (params/LN stats/head stay f32), mirroring the ViT
    family's opt-in. ``train.attn_impl`` selects the score-dtype recipe for
    the dense-masked attention path (default 'xla': f32 scores + f32
    softmax, the reference numerics)."""
    dtype = (
        jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    )
    impl = attn_impl or cfg.train.attn_impl or "xla"
    if impl in ("pallas", "hybrid"):
        impl = "xla"  # biased attention: the Pallas kernels don't apply
    return SwinTransformer(
        img_size=cfg.data.input_size,
        patch_size=cfg.swin.patch_size,
        in_chans=cfg.data.num_channels,
        num_classes=cfg.data.num_classes,
        embed_dim=cfg.swin.embed_dim,
        depths=tuple(cfg.swin.depths),
        num_heads=tuple(cfg.swin.num_heads),
        window=cfg.swin.window_size,
        mlp_ratio=float(cfg.swin.mlp_ratio),
        attn_impl=impl,
        dtype=dtype,
    )
