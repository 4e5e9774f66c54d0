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
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, return_attn: bool = False
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """q, k, v: [B, N, H, hd] -> out [B, N, H, hd] (+ optional [B, H, N, N])."""
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    # [B, H, N, N] scores, f32 accumulation on the MXU
    scores = (
        jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    if v.dtype == jnp.bfloat16 and not return_attn:
        # bf16 mixed-precision: the step is HBM-bound on this N^2 tensor, so
        # STORE it bf16 while keeping the softmax MATH f32 — the casts fuse
        # into the producing/consuming fusions, halving score traffic. The
        # probability normalizer stays an f32 row reduction; only the stored
        # logits/probs quantize (validated: tests/test_bf16_parity.py drift
        # bounds + BMU agreement).
        s16 = scores.astype(jnp.bfloat16)
        s32 = s16.astype(jnp.float32)
        m = jnp.max(s32, axis=-1, keepdims=True)
        p16 = jnp.exp(s32 - m).astype(jnp.bfloat16)
        denom = jnp.sum(p16.astype(jnp.float32), axis=-1, keepdims=True)
        attn_c = checkpoint_name(
            p16 * (1.0 / denom).astype(jnp.bfloat16), "attn_probs"
        )
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn_c, v, preferred_element_type=jnp.float32
        )
        return out, None
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


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "xla",
    return_attn: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Dispatch over attention implementations.

    impl='pallas' uses the fused VMEM-resident kernel (falls back to XLA when
    the attention matrix itself is requested, which only happens in offline
    visualization paths).
    """
    if impl == "pallas" and not return_attn:
        from vitsom_tpu.ops.attention_pallas import fused_attention

        return fused_attention(q, k, v), None
    return xla_attention(q, k, v, return_attn=return_attn)
