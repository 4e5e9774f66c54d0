"""Fused multi-head attention Pallas (Mosaic/TPU) kernels, fwd + bwd.

The reference's eager attention materializes the [B, H, N, N] score matrix
in HBM twice (scores then softmax output, ``/root/reference/models/vit.py:
28-43``), and autograd saves it again as a residual for the backward.
Profiling the 24x24 MNIST clustering step on v5e showed exactly this as the
dominant cost: per step, each of the 6 blocks moved ~180 MB of [128,2,197,
197] score traffic through HBM (softmax fusions, residual copies across the
scan body, backward reads) while every matmul was tiny.

Sequences in every shipped config are short (N = 65..257), so the per-head
score matrix fits comfortably in VMEM. Both kernels exploit that:

- forward: scale -> QK^T -> softmax -> AV, emitting only the output and the
  log-sum-exp rows (flash-attention residuals) — no HBM round-trip for the
  N x N intermediates;
- backward: recomputes the probabilities in VMEM from (q, k, lse), then
  forms dv, dp, ds, dq, dk in-register. HBM traffic is [B, N, D]-sized
  tensors only, for fwd and bwd alike.

This is the flash-attention recipe without the sequence tiling (the tiling
machinery would only add overhead at N<=257 — the whole matrix IS one tile).

STATUS — measured on v5e (24x24 MNIST clustering step, bf16), this kernel
is NOT the product path: 2.58 ms/step at its best block size (bb=16; 2.66 at
bb=8, 2.71 at bb=32, bb>=64 fails VMEM compile) vs 2.44 ms for XLA eager
attention and 2.07 ms for XLA + remat_blocks (which kills the same score
residuals by recomputing — the fixed ~8us/program Pallas dispatch cost at
12 calls x B/bb programs per step never amortizes at these tiny shapes).
Kept in-tree, parity-tested, behind ``train.use_pallas_attention`` for
larger-model configs where the slab economics flip.

Layout and op shape matter as much as fusion at these sizes (head_dim 2..8,
every matmul latency- not throughput-bound on the MXU). Measured failure
modes that shaped the design:
- one program per (b, h): 256 programs/call whose fixed costs dominate;
- per-sample 2D dots unrolled inside a slab program: >10k tiny MXU ops/step;
- [B, N, H, hd] -> [B, H, N, hd] HBM transposes around every call (8 per
  block per step) to give programs (N, hd)-trailing blocks.
So: tensors stay in the model's native [B, N, D] layout (D = H*hd — the
reshape from [B, N, H, hd] is a free bitcast), each program takes a
_BATCH_BLOCK-row slab, heads are static LANE slices inside the kernel, and
each matmul role is one batched ``dot_general`` over the slab.

On non-TPU backends (the CPU test mesh) the kernels run in interpreter mode,
so the same code path is exercised everywhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# batch rows per program (largest divisor of B wins below). Program fixed
# costs ~8us dominate at small blocks (192 programs/step at bb=8), so bigger
# is better until the N x N slabs exhaust VMEM; env knob for A/B sweeps.
_BATCH_BLOCK = int(os.environ.get("VITSOM_ATTN_BB", "16"))

# larger slabs need more scoped VMEM than the 16MB default (v5e has 128MB);
# the N x N score/probability slabs are the sizing term
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=int(os.environ.get("VITSOM_ATTN_VMEM_MB", "100")) * 1024 * 1024
)

# dot_general dimension_numbers for [G, N, K] x [G, M, K] style batched dots
_BATCH_NT = (((2,), (2,)), ((0,), (0,)))  # contract last dims
_BATCH_NN = (((2,), (1,)), ((0,), (0,)))  # contract (last, middle)
_BATCH_TN = (((1,), (1,)), ((0,), (0,)))  # contract middle (row) dims


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _batch_block(b: int) -> int:
    bb = _BATCH_BLOCK
    while b % bb:
        bb //= 2
    return max(bb, 1)


def _specs(b: int, h: int, n: int, d: int, bb: int):
    block = pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # lse is [B, H, N]: the last two block dims (H, N) equal the array dims,
    # which Mosaic accepts for non-tile-aligned sizes
    lse_block = pl.BlockSpec((bb, h, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return (b // bb,), block, lse_block


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, heads: int):
    """One batch-slab program: q/k/v/o refs are [bb, N, D] blocks, lse_ref
    [bb, H, N]; heads are static lane slices, each matmul role one batched
    dot over the slab."""
    bb, n, d = q_ref.shape
    hd = d // heads
    qf = q_ref[...]
    kf = k_ref[...]
    vf = v_ref[...]
    outs = []
    for head in range(heads):
        sl = slice(head * hd, (head + 1) * hd)
        q, k, v = qf[:, :, sl], kf[:, :, sl], vf[:, :, sl]
        scores = (
            jax.lax.dot_general(q, k, _BATCH_NT, preferred_element_type=jnp.float32)
            * scale
        )  # [bb, N, N]
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        attn = (p / l).astype(v.dtype)
        outs.append(
            jax.lax.dot_general(attn, v, _BATCH_NN, preferred_element_type=jnp.float32)
        )
        lse_ref[:, head, :] = (m + jnp.log(l))[:, :, 0]
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _fused_attention_fwd_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    b, n, h, hd = q.shape
    d = h * hd
    scale = hd**-0.5
    bb = _batch_block(b)
    kernel = functools.partial(_attn_fwd_kernel, scale=scale, heads=h)

    # [B, N, H, hd] -> [B, N, D]: contiguous reshape, NOT a transpose
    qr, kr, vr = (x.reshape(b, n, d) for x in (q, k, v))
    grid, block, lse_block = _specs(b, h, n, d, bb)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block, block, block],
        out_specs=[block, lse_block],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n * n * hd,
            bytes_accessed=4 * b * n * d * 4,
            transcendentals=b * h * n * n,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_use_interpret(),
    )(qr, kr, vr)
    return out.reshape(b, n, h, hd), (qr, kr, vr, out, lse)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float, heads: int,
):
    """Recompute-in-VMEM backward for one batch-slab program."""
    bb, n, d = q_ref.shape
    hd = d // heads
    qf = q_ref[...]
    kf = k_ref[...]
    vf = v_ref[...]
    of = o_ref[...]
    dof = do_ref[...]
    dqs, dks, dvs = [], [], []
    for head in range(heads):
        sl = slice(head * hd, (head + 1) * hd)
        q, k, v = qf[:, :, sl], kf[:, :, sl], vf[:, :, sl]
        o, do = of[:, :, sl], dof[:, :, sl]
        lse = lse_ref[:, head, :]  # [bb, N]

        scores = (
            jax.lax.dot_general(q, k, _BATCH_NT, preferred_element_type=jnp.float32)
            * scale
        )
        p = jnp.exp(scores - lse[:, :, None])  # == softmax(scores), exactly

        pc = p.astype(v.dtype)
        dvs.append(
            jax.lax.dot_general(pc, do, _BATCH_TN, preferred_element_type=jnp.float32)
        )
        dp = jax.lax.dot_general(do, v, _BATCH_NT, preferred_element_type=jnp.float32)
        # delta_i = sum_j do_ij * o_ij (rowwise) — softmax-jacobian diag term
        delta = jnp.sum(
            do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
        )
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dqs.append(
            jax.lax.dot_general(ds, k, _BATCH_NN, preferred_element_type=jnp.float32)
        )
        dks.append(
            jax.lax.dot_general(ds, q, _BATCH_TN, preferred_element_type=jnp.float32)
        )
    dq_ref[...] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    dk_ref[...] = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
    dv_ref[...] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)


def _fused_attention_bwd_impl(residuals, g):
    qr, kr, vr, out, lse = residuals
    b, n, d = qr.shape
    h = lse.shape[1]
    hd = d // h
    scale = hd**-0.5
    bb = _batch_block(b)
    kernel = functools.partial(_attn_bwd_kernel, scale=scale, heads=h)

    gr = g.reshape(b, n, d)
    grid, block, lse_block = _specs(b, h, n, d, bb)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block, block, block, block, lse_block, block],
        out_specs=[block, block, block],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), qr.dtype),
            jax.ShapeDtypeStruct((b, n, d), kr.dtype),
            jax.ShapeDtypeStruct((b, n, d), vr.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * b * h * n * n * hd,
            bytes_accessed=7 * b * n * d * 4,
            transcendentals=b * h * n * n,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_use_interpret(),
    )(qr, kr, vr, out, lse, gr)
    return (
        dq.reshape(b, n, h, hd),
        dk.reshape(b, n, h, hd),
        dv.reshape(b, n, h, hd),
    )


# ---------------------------------------------------------------------------
# custom-VJP op
# ---------------------------------------------------------------------------


@jax.custom_vjp
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q, k, v: [B, N, H, hd] -> out [B, N, H, hd], softmax(QK^T/sqrt(hd))V."""
    out, _ = _fused_attention_fwd_impl(q, k, v)
    return out


def _fwd(q, k, v):
    return _fused_attention_fwd_impl(q, k, v)


fused_attention.defvjp(_fwd, _fused_attention_bwd_impl)
