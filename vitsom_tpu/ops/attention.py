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
    # [B, H, N, N]; scores + softmax in f32 regardless of q/k dtype (bf16
    # mixed-precision mode keeps the reduction numerics stable)
    scores = (
        jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        * scale
    )
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
