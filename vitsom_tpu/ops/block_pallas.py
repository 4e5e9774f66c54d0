"""Fully-fused pre-norm transformer block as Pallas kernels (fwd + bwd).

STATUS: experimental, NOT the default path. Measured on v5e at the ViT-SOM
clustering shape ([128, 197, 16], 2 heads): 2.6 ms/block fwd+bwd vs 0.62 ms
for the XLA block — the per-sample attention fori_loop serializes 16 tiny
[197, 8] matmul chains per program that XLA instead executes as one batched
einsum, and at head_dim 8 both paths are contraction-limited on the MXU
(8/128 lanes), so removing op-launch overhead cannot make up for losing the
batching. Kept as a complete, tested (values + grads vs the XLA block)
demonstration of a full custom-VJP block kernel; revisit if a Mosaic
batched-matmul primitive lands or for models with head_dim >= 128.

Hypothesis it tested: a train step executes ~40 XLA ops per block on tiny
tensors, each with ~5-10us fixed cost. This kernel runs the ENTIRE block —
LN1 -> QKV -> per-head attention -> proj -> residual -> LN2 -> MLP(GELU) ->
residual — for a batch tile in one program, all intermediates VMEM-resident.

Backward is a second Pallas kernel over the same grid: it recomputes the
forward intermediates from the saved block input (recompute is ~free here;
op-launch overhead is what costs) and produces dx plus weight gradients,
accumulated across batch tiles in VMEM output refs (the TPU grid executes
sequentially, so read-modify-write accumulation across grid steps is safe).

Numerics match the XLA block (``vitsom_tpu/models/vit.Block``): f32
throughout, exact-erf GELU, LayerNorm eps 1e-6. Equivalence is tested in
``tests/test_block_pallas.py`` (values and gradients).

Weight layout (all f32): ln1_scale/ln1_bias [D], qkv_kernel [D, 3D],
qkv_bias [3D], proj_kernel [D, D], proj_bias [D], ln2_scale/ln2_bias [D],
fc1_kernel [D, M], fc1_bias [M], fc2_kernel [M, D], fc2_bias [D].
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6
_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)

WEIGHT_NAMES = (
    "ln1_scale", "ln1_bias", "qkv_kernel", "qkv_bias", "proj_kernel",
    "proj_bias", "ln2_scale", "ln2_bias", "fc1_kernel", "fc1_bias",
    "fc2_kernel", "fc2_bias",
)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def weight_shapes(dim: int, mlp_hidden: int):
    return {
        "ln1_scale": (dim,), "ln1_bias": (dim,),
        "qkv_kernel": (dim, 3 * dim), "qkv_bias": (3 * dim,),
        "proj_kernel": (dim, dim), "proj_bias": (dim,),
        "ln2_scale": (dim,), "ln2_bias": (dim,),
        "fc1_kernel": (dim, mlp_hidden), "fc1_bias": (mlp_hidden,),
        "fc2_kernel": (mlp_hidden, dim), "fc2_bias": (dim,),
    }


# ---------------------------------------------------------------------------
# in-kernel math helpers (operate on [R, D] f32)
# ---------------------------------------------------------------------------


def _ln_fwd(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = xc * rstd
    return xhat * scale + bias, xhat, rstd


def _ln_bwd(dout, xhat, rstd, scale):
    """Returns (dx, dscale_partial, dbias_partial)."""
    dxhat = dout * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    return dx, jnp.sum(dout * xhat, axis=0), jnp.sum(dout, axis=0)


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7) — Mosaic
    has no erf lowering, so the kernel carries its own implementation."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # exact-erf GELU semantics (torch nn.GELU default), erf via _erf
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def _gelu_grad(x):
    cdf = 0.5 * (1.0 + _erf(x * _INV_SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)
    return cdf + x * pdf


def _softmax_rows(s):
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _attention_fwd_scratch(qkv_ref, o_ref, bt, n, heads, hd, scale):
    """qkv_ref scratch [bt, n, 3D] -> writes concat-head output into o_ref
    scratch [bt, n, D].

    A ``fori_loop`` over samples (dynamic leading-index ref access — the one
    dynamic-indexing form Mosaic lowers) keeps exactly ONE [N, N] score
    matrix live at a time; a fully unrolled loop lets the scheduler keep
    every pair's intermediates alive and blows scoped VMEM (observed: 44 MB
    at bt=8). Heads unroll in Python (static lane slices)."""
    d = heads * hd
    for h in range(heads):
        qs, ks, vs = (
            slice(h * hd, (h + 1) * hd),
            slice(d + h * hd, d + (h + 1) * hd),
            slice(2 * d + h * hd, 2 * d + (h + 1) * hd),
        )

        def body(b, _):
            q = qkv_ref[b, :, qs]
            k = qkv_ref[b, :, ks]
            v = qkv_ref[b, :, vs]
            p = _softmax_rows(
                jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            )
            o_ref[b, :, qs] = jnp.dot(p, v, preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, bt, body, 0)


def _attention_bwd_scratch(qkv_ref, do_ref, dqkv_ref, bt, n, heads, hd, scale):
    """Writes d(attention)/d(qkv) into dqkv_ref scratch [bt, n, 3D], reading
    the packed qkv and the output cotangent from scratch refs."""
    d = heads * hd
    for h in range(heads):
        qs, ks, vs = (
            slice(h * hd, (h + 1) * hd),
            slice(d + h * hd, d + (h + 1) * hd),
            slice(2 * d + h * hd, 2 * d + (h + 1) * hd),
        )

        def body(b, _):
            q = qkv_ref[b, :, qs]
            k = qkv_ref[b, :, ks]
            v = qkv_ref[b, :, vs]
            p = _softmax_rows(
                jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            )
            do = do_ref[b, :, qs]
            dv = jnp.dot(p.T, do, preferred_element_type=jnp.float32)
            dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
            ds = (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * p * scale
            dqkv_ref[b, :, qs] = jnp.dot(ds, k, preferred_element_type=jnp.float32)
            dqkv_ref[b, :, ks] = jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
            dqkv_ref[b, :, vs] = dv
            return 0

        jax.lax.fori_loop(0, bt, body, 0)


def _block_fwd_core(x2d, w, qkv_sc, o_sc, bt, n, heads, hd, mlp_hidden):
    """Forward math shared by fwd kernel and bwd recompute.

    x2d: [bt*n, D] f32; qkv_sc/o_sc: VMEM scratch refs [bt, n, 3D]/[bt, n, D]
    used by the per-sample attention loop. Returns (y, cache)."""
    dim = heads * hd
    scale = hd**-0.5
    h1, xhat1, rstd1 = _ln_fwd(x2d, w["ln1_scale"], w["ln1_bias"])
    qkv = (
        jnp.dot(h1, w["qkv_kernel"], preferred_element_type=jnp.float32)
        + w["qkv_bias"]
    )
    qkv_sc[...] = qkv.reshape(bt, n, 3 * dim)
    _attention_fwd_scratch(qkv_sc, o_sc, bt, n, heads, hd, scale)
    o_cat = o_sc[...].reshape(bt * n, dim)
    a = (
        jnp.dot(o_cat, w["proj_kernel"], preferred_element_type=jnp.float32)
        + w["proj_bias"]
    )
    r = x2d + a
    h2, xhat2, rstd2 = _ln_fwd(r, w["ln2_scale"], w["ln2_bias"])
    m1 = (
        jnp.dot(h2, w["fc1_kernel"], preferred_element_type=jnp.float32)
        + w["fc1_bias"]
    )
    gm = _gelu(m1)
    m2 = (
        jnp.dot(gm, w["fc2_kernel"], preferred_element_type=jnp.float32)
        + w["fc2_bias"]
    )
    y = r + m2
    cache = dict(
        h1=h1, xhat1=xhat1, rstd1=rstd1, o_cat=o_cat, r=r,
        h2=h2, xhat2=xhat2, rstd2=rstd2, m1=m1, gm=gm,
    )
    return y, cache


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, *rest, bt, n, dim, heads, hd, mlp_hidden):
    w_refs = rest[: len(WEIGHT_NAMES)]
    y_ref, qkv_sc, o_sc = rest[len(WEIGHT_NAMES) :]
    w = {name: ref[...] for name, ref in zip(WEIGHT_NAMES, w_refs)}
    x2d = x_ref[...].reshape(bt * n, dim)
    y, _ = _block_fwd_core(x2d, w, qkv_sc, o_sc, bt, n, heads, hd, mlp_hidden)
    y_ref[...] = y.reshape(bt, n, dim)


def _bwd_kernel(x_ref, dy_ref, *rest, bt, n, dim, heads, hd, mlp_hidden):
    nw = len(WEIGHT_NAMES)
    w_refs = rest[:nw]
    dx_ref = rest[nw]
    dw_refs = rest[nw + 1 : 2 * nw + 1]
    qkv_sc, o_sc, do_sc, dqkv_sc = rest[2 * nw + 1 :]
    w = {name: ref[...] for name, ref in zip(WEIGHT_NAMES, w_refs)}

    x2d = x_ref[...].reshape(bt * n, dim)
    dy = dy_ref[...].reshape(bt * n, dim)
    scale = hd**-0.5

    _, c = _block_fwd_core(x2d, w, qkv_sc, o_sc, bt, n, heads, hd, mlp_hidden)

    # ---- MLP backward ----
    dm2 = dy
    dW2 = jnp.dot(c["gm"].T, dm2, preferred_element_type=jnp.float32)
    dc2 = jnp.sum(dm2, axis=0)
    dgm = jnp.dot(dm2, w["fc2_kernel"].T, preferred_element_type=jnp.float32)
    dm1 = dgm * _gelu_grad(c["m1"])
    dW1 = jnp.dot(c["h2"].T, dm1, preferred_element_type=jnp.float32)
    dc1 = jnp.sum(dm1, axis=0)
    dh2 = jnp.dot(dm1, w["fc1_kernel"].T, preferred_element_type=jnp.float32)

    dln2_x, dg2, db2 = _ln_bwd(dh2, c["xhat2"], c["rstd2"], w["ln2_scale"])
    dr = dy + dln2_x

    # ---- attention backward ----
    da = dr
    dWp = jnp.dot(c["o_cat"].T, da, preferred_element_type=jnp.float32)
    dbp = jnp.sum(da, axis=0)
    do_cat = jnp.dot(da, w["proj_kernel"].T, preferred_element_type=jnp.float32)
    do_sc[...] = do_cat.reshape(bt, n, dim)
    _attention_bwd_scratch(qkv_sc, do_sc, dqkv_sc, bt, n, heads, hd, scale)
    dqkv = dqkv_sc[...].reshape(bt * n, 3 * dim)
    dWqkv = jnp.dot(c["h1"].T, dqkv, preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv, axis=0)
    dh1 = jnp.dot(dqkv, w["qkv_kernel"].T, preferred_element_type=jnp.float32)

    dln1_x, dg1, db1 = _ln_bwd(dh1, c["xhat1"], c["rstd1"], w["ln1_scale"])
    dx = dr + dln1_x

    dx_ref[...] = dx.reshape(bt, n, dim)

    grads = {
        "ln1_scale": dg1, "ln1_bias": db1, "qkv_kernel": dWqkv,
        "qkv_bias": dbqkv, "proj_kernel": dWp, "proj_bias": dbp,
        "ln2_scale": dg2, "ln2_bias": db2, "fc1_kernel": dW1,
        "fc1_bias": dc1, "fc2_kernel": dW2, "fc2_bias": dc2,
    }
    t = pl.program_id(0)
    for name, ref in zip(WEIGHT_NAMES, dw_refs):
        g = grads[name].reshape(ref.shape)

        @pl.when(t == 0)
        def _init(ref=ref, g=g):
            ref[...] = g

        @pl.when(t != 0)
        def _acc(ref=ref, g=g):
            ref[...] = ref[...] + g


# ---------------------------------------------------------------------------
# host-side op
# ---------------------------------------------------------------------------


def _pick_batch_tile(b: int) -> int:
    # the per-sample attention loop unrolls bt*heads times inside the kernel;
    # 8 keeps Mosaic compile time sane while amortizing grid overhead
    for bt in (8, 4, 2, 1):
        if b % bt == 0:
            return bt
    return 1


def make_fused_block(dim: int, num_heads: int, mlp_ratio: float, seq_len: int):
    """Returns ``block(x [B, N, D] f32, weights dict) -> y [B, N, D]`` with a
    fully-fused Pallas forward and backward."""
    mlp_hidden = int(dim * mlp_ratio)
    hd = dim // num_heads
    shapes = weight_shapes(dim, mlp_hidden)

    def _call_fwd(x, w):
        b, n, d = x.shape
        bt = _pick_batch_tile(b)
        kernel = functools.partial(
            _fwd_kernel, bt=bt, n=n, dim=d, heads=num_heads, hd=hd,
            mlp_hidden=mlp_hidden,
        )
        x_spec = pl.BlockSpec((bt, n, d), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
        w_specs = [
            pl.BlockSpec(shapes[name], lambda t, name=name: (0,) * len(shapes[name]),
                         memory_space=pltpu.VMEM)
            for name in WEIGHT_NAMES
        ]
        return pl.pallas_call(
            kernel,
            grid=(b // bt,),
            in_specs=[x_spec] + w_specs,
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((bt, n, 3 * d), jnp.float32),  # qkv
                pltpu.VMEM((bt, n, d), jnp.float32),      # attention out
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=_use_interpret(),
        )(x, *[w[name] for name in WEIGHT_NAMES])

    def _call_bwd(x, dy, w):
        b, n, d = x.shape
        bt = _pick_batch_tile(b)
        kernel = functools.partial(
            _bwd_kernel, bt=bt, n=n, dim=d, heads=num_heads, hd=hd,
            mlp_hidden=mlp_hidden,
        )
        x_spec = pl.BlockSpec((bt, n, d), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
        w_specs = [
            pl.BlockSpec(shapes[name], lambda t, name=name: (0,) * len(shapes[name]),
                         memory_space=pltpu.VMEM)
            for name in WEIGHT_NAMES
        ]
        dw_shapes = [
            jax.ShapeDtypeStruct(shapes[name], jnp.float32) for name in WEIGHT_NAMES
        ]
        dx, *dws = pl.pallas_call(
            kernel,
            grid=(b // bt,),
            in_specs=[x_spec, x_spec] + w_specs,
            out_specs=[x_spec] + w_specs,
            out_shape=[jax.ShapeDtypeStruct((b, n, d), jnp.float32)] + dw_shapes,
            scratch_shapes=[
                pltpu.VMEM((bt, n, 3 * d), jnp.float32),  # qkv
                pltpu.VMEM((bt, n, d), jnp.float32),      # attention out
                pltpu.VMEM((bt, n, d), jnp.float32),      # d(attention out)
                pltpu.VMEM((bt, n, 3 * d), jnp.float32),  # d(qkv)
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=_use_interpret(),
        )(x, dy, *[w[name] for name in WEIGHT_NAMES])
        return dx, dict(zip(WEIGHT_NAMES, dws))

    @jax.custom_vjp
    def block(x, w):
        return _call_fwd(x, w)

    def block_fwd(x, w):
        return _call_fwd(x, w), (x, w)

    def block_bwd(res, dy):
        x, w = res
        dx, dw = _call_bwd(x, dy, w)
        return dx, dw

    block.defvjp(block_fwd, block_bwd)
    return block
