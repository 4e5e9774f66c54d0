"""Fused multi-head attention Pallas (Mosaic/TPU) kernel.

The reference's eager attention materializes the [B, H, N, N] score matrix
in HBM twice (scores then softmax output, ``/root/reference/models/vit.py:
28-43``). Sequences in every shipped config are short (N = 65..257), so for
one (batch, head) pair the entire score matrix fits comfortably in VMEM:
this kernel runs scale -> QK^T -> masked softmax -> AV per (b, h) program
without any HBM round-trip for the intermediates.

Backward: the forward saves only (q, k, v); the VJP recomputes through the
XLA attention oracle (``vitsom_tpu/ops/attention.xla_attention``). For these
sequence lengths the recompute is cheaper than storing the attention matrix,
and XLA fuses the backward einsums well — custom backward kernels would only
matter at flash-attention scales this model family never reaches.

On non-TPU backends (the CPU test mesh) the kernel runs in interpreter mode,
so the same code path is exercised everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (batch, head) program: refs are [1, 1, N, hd] blocks (the last
    two block dims must equal the array dims or be tile-aligned on TPU)."""
    q = q_ref[0, 0, :, :]  # [N, hd]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]

    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.dot(attn.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


def _fused_attention_fwd_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    b, n, h, hd = q.shape
    scale = hd**-0.5
    kernel = functools.partial(_attn_kernel, scale=scale)

    # [B, N, H, hd] -> [B, H, N, hd] so the block's trailing dims are (N, hd)
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    block = pl.BlockSpec(
        (1, 1, n, hd),
        lambda i, j: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((b, h, n, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n * n * hd,
            bytes_accessed=4 * b * n * h * hd * 4,
            transcendentals=b * h * n * n,
        ),
        interpret=_use_interpret(),
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


@jax.custom_vjp
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q, k, v: [B, N, H, hd] -> out [B, N, H, hd], softmax(QK^T/sqrt(hd))V."""
    return _fused_attention_fwd_impl(q, k, v)


def _fwd(q, k, v):
    return _fused_attention_fwd_impl(q, k, v), (q, k, v)


def _bwd(residuals, g):
    q, k, v = residuals
    from vitsom_tpu.ops.attention import xla_attention

    _, vjp = jax.vjp(lambda q_, k_, v_: xla_attention(q_, k_, v_)[0], q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)
