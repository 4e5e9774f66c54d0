"""Multi-head attention dispatch: XLA reference path + Pallas fused kernel.

The reference materializes the full [B, H, N, N] attention matrix in eager
torch (``/root/reference/models/vit.py:28-43``). Sequences here are short
(N <= 257: 14x14 patches + CLS for MNIST, 8x8 + CLS for CIFAR), so the whole
score matrix fits in VMEM; the Pallas kernel (``vitsom_tpu/ops/attention_pallas``)
fuses scale + matmul + softmax + matmul per (batch, head) without HBM
round-trips. The XLA path is the correctness oracle and the default.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def xla_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, return_attn: bool = False,
    bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """q, k, v: [B, N, H, hd] -> out [B, N, H, hd] (+ optional [B, H, N, N]).

    ``bias``: optional additive [H, N, N] (or broadcastable) term applied to
    the scaled scores before softmax — relative-position bias + window/shift
    masks for Swin's dense-masked window attention (models/swin.py)."""
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    # [B, H, N, N] scores, f32 accumulation on the MXU
    scores = (
        jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)[None]
    # NOTE: storing scores/probs in bf16 with f32 softmax math was tried and
    # measured ~3% SLOWER (59.7k vs 61.7k img/s, reproduced twice) — the
    # manual max/exp/sum chain reads the score tensor one extra time and the
    # compiler's own softmax fusion already keeps the f32 traffic minimal.
    attn = jax.nn.softmax(scores, axis=-1)
    # named for remat policies: save_only_these_names('attn_probs') keeps
    # this tensor as the backward residual. Measured SLOWER than full remat
    # on v5e at these shapes (see models/vit.py) — left in place because it
    # is free and lets larger-model configs flip the policy without touching
    # this op.
    attn_c = checkpoint_name(attn.astype(v.dtype), "attn_probs")
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", attn_c, v, preferred_element_type=jnp.float32
    )
    return out, (attn if return_attn else None)


def xla_attention_bf16_scores(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, None]:
    """XLA attention with NATIVE bf16 score/prob tensors (softmax included).

    Distinct from the rejected "bf16 storage + f32 softmax math" variant
    (note in :func:`xla_attention`): here the [B, H, N, N] tensors are bf16
    end to end, so the compiler keeps its usual softmax fusion structure but
    every HBM pass over the score tensor moves half the bytes — forward AND
    backward (the softmax VJP's dscores/dprobs tensors are bf16 too). The
    MXU still accumulates the QK^T products in f32 internally; only the
    stored outputs round to bf16. Scale is folded into q ([B, N, H, hd])
    instead of the scores ([B, H, N, N]).

    Numerics: bf16 exp/sum in the softmax introduces ~1e-2 relative error
    on the attention probabilities. Clustering-quality parity is validated
    the same way as compute_dtype=bf16 (purity match on the benchmark
    protocol) before this impl is used in any shipped config.
    """
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    qb = (q * scale).astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)
    # f32 accumulation requested EXPLICITLY (not just TPU MXU behavior — on
    # CPU/GPU a bf16x bf16 dot may otherwise accumulate in bf16); the
    # trailing convert to bf16 storage fuses into the dot's epilogue.
    scores = jnp.einsum(
        "bnhd,bmhd->bhnm", qb, kb, preferred_element_type=jnp.float32
    )
    if bias is not None:
        # added in the f32 epilogue BEFORE the bf16 store so the bias (incl.
        # -1e9 window masks) fuses into the dot instead of forcing an upcast
        scores = scores + bias.astype(jnp.float32)[None]
    scores = scores.astype(jnp.bfloat16)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = checkpoint_name(attn, "attn_probs")
    out = jnp.einsum(
        "bhnm,bmhd->bnhd",
        attn,
        v.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out, None


def xla_attention_bf16_store(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, None]:
    """bf16 score STORAGE, f32 softmax MATH (compiler-fused upcast).

    Halfway point between :func:`xla_attention` (f32 scores) and
    :func:`xla_attention_bf16_scores` (bf16 softmax math): the [B, H, N, N]
    tensors in HBM are bf16 — half the bytes per pass on the HBM-bound step —
    but the exp/sum run in f32 registers via ``astype`` INSIDE the softmax
    input (XLA folds the convert into the softmax fusion, unlike the
    previously rejected manual max/exp/sum chain which re-read the score
    tensor an extra time; see the note in xla_attention). Only the bf16
    rounding of the scores themselves differs numerically from the stock
    path (which already stores probs in bf16 via ``astype(v.dtype)``).
    """
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    qb = (q * scale).astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)
    # explicit f32 accumulation + fused bf16 store (see note in
    # xla_attention_bf16_scores — portability, not a TPU-only assumption)
    scores = jnp.einsum(
        "bnhd,bmhd->bhnm", qb, kb, preferred_element_type=jnp.float32
    )
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)[None]
    scores = scores.astype(jnp.bfloat16)
    attn = checkpoint_name(_softmax_f32math_bf16store(scores), "attn_probs")
    out = jnp.einsum(
        "bhnm,bmhd->bnhd",
        attn,
        v.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out, None


@jax.custom_vjp
def _softmax_f32math_bf16store(scores: jnp.ndarray) -> jnp.ndarray:
    """softmax with f32 register math over a bf16 tensor, bf16 output.

    custom_vjp so the ONLY residual autodiff keeps is the bf16 probs (the
    plain ``softmax(scores.astype(f32))`` formulation saves the f32 probs as
    the softmax-VJP residual, putting the full-width tensor right back on
    the HBM path this impl exists to halve)."""
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
        jnp.bfloat16
    )


def _softmax_b16s_fwd(scores):
    probs = _softmax_f32math_bf16store(scores)
    return probs, probs


def _softmax_b16s_bwd(probs, g):
    # d(scores) = p * (g - sum(g * p)); f32 math via fused upcast-on-read
    pf = probs.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    inner = jnp.sum(gf * pf, axis=-1, keepdims=True)
    return ((pf * (gf - inner)).astype(jnp.bfloat16),)


_softmax_f32math_bf16store.defvjp(_softmax_b16s_fwd, _softmax_b16s_bwd)


@jax.custom_vjp
def hybrid_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """XLA forward + Pallas backward.

    The forward is the XLA einsum/softmax path (measured fastest at these
    shapes); the residuals are flash-attention-style — (q, k, v, out, lse),
    all [B, N, D]-sized — so autograd never stores an N x N tensor, and the
    backward is the VMEM-recompute Pallas kernel
    (``attention_pallas._fused_attention_bwd_impl``). Alternative to
    ``train.remat_blocks`` that trades the remat replay of the whole block
    for one Pallas program per batch-slab.

    Measured on v5e (24x24 MNIST clustering, bf16): 2.31 ms/step vs 2.07 for
    XLA + remat_blocks — the Pallas program fixed costs exceed the
    bwd-chain traffic they remove at these shapes. Kept parity-tested
    (tests/test_pallas_kernels.py) for larger-sequence configs."""
    out, _ = _hybrid_fwd(q, k, v)
    return out


def _hybrid_fwd(q, k, v):
    b, n, h, hd = q.shape
    d = h * hd
    scale = hd**-0.5
    scores = (
        jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    m = jnp.max(scores, axis=-1)  # [B, H, N]
    p = jnp.exp(scores - m[..., None])
    denom = jnp.sum(p, axis=-1)  # [B, H, N]
    attn = (p / denom[..., None]).astype(v.dtype)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", attn, v, preferred_element_type=jnp.float32
    )
    lse = m + jnp.log(denom)
    res = (
        q.reshape(b, n, d),
        k.reshape(b, n, d),
        v.reshape(b, n, d),
        out.reshape(b, n, d),
        lse,
    )
    return out, res


def _hybrid_bwd(res, g):
    from vitsom_tpu.ops.attention_pallas import _fused_attention_bwd_impl

    return _fused_attention_bwd_impl(res, g)


hybrid_attention.defvjp(_hybrid_fwd, _hybrid_bwd)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "xla",
    return_attn: bool = False,
    bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Dispatch over attention implementations.

    impl='pallas' uses the fused VMEM-resident kernel; impl='hybrid' pairs
    the XLA forward with the Pallas backward. ``return_attn=True`` falls
    back to the stock f32 :func:`xla_attention` path for EVERY non-xla impl
    (pallas/hybrid/xla_bf16/xla_bf16s) — it only happens in offline
    visualization, so logged attention maps are f32 even when training ran
    bf16 score numerics (covered by ``test_xla_bf16_dispatch``).

    ``bias`` (additive [H, N, N] pre-softmax term — Swin dense-masked window
    attention) is supported by the XLA impls only; pallas/hybrid fall back
    to the equivalent XLA path when a bias is given.
    """
    if impl == "pallas" and not return_attn and bias is None:
        from vitsom_tpu.ops.attention_pallas import fused_attention

        return fused_attention(q, k, v), None
    if impl == "hybrid" and not return_attn and bias is None:
        return hybrid_attention(q, k, v), None
    if impl == "xla_bf16" and not return_attn:
        return xla_attention_bf16_scores(q, k, v, bias=bias)
    if impl == "xla_bf16s" and not return_attn:
        return xla_attention_bf16_store(q, k, v, bias=bias)
    return xla_attention(q, k, v, return_attn=return_attn, bias=bias)
