"""Fused SOM step as a Pallas (Mosaic/TPU) kernel with a custom VJP.

The SOM hot loop (reference ``/root/reference/models/som_layer.py:83-152``)
is: pairwise latent-to-prototype distances -> BMU argmin -> Gaussian
neighborhood weights -> weighted-mean loss. The XLA path materializes the
[B, P] distance matrix in HBM, gathers [B, P] grid-distance rows from a
static [P, P] table, and reduces. This kernel fuses the whole chain:

- prototypes stream through VMEM in 128-row tiles (a 40x40 map's prototype
  matrix is [1600, 3136] = 20 MB and cannot sit in VMEM whole);
- the [B, P] distance matrix never leaves VMEM until the final tile, where
  BMU, neighborhood weights (computed *analytically* from grid indices — no
  [P, P] table in memory at all), and the weighted-mean loss are produced
  in-register;
- outputs: loss scalar, BMU indices, and the distance matrix (saved as the
  VJP residual so the backward pass runs zero large recomputes).

Backward is closed-form XLA (two matmuls), derived from the reference's
autograd semantics: neighborhood weights are stop-gradient (they depend on
inputs only through the integer argmin), so

  L = mean(w * d),   dL/dd_bp = g * w_bp / (B*P) =: c_bp

  euclidean  d = ||x-p||:   dx_b = x_b * sum_p(e) - e @ P,   e = c / d
                            dp_p = p_p * sum_b(e) - e^T @ x
  cosine     d = 1 - xn.pn: dx_b = -(c @ Pn - sum_p(c*s) * xn_b) / ||x_b||
                            dp_p = -(c^T @ Xn - sum_b(c*s) * pn_p) / ||p_p||
  with s = 1 - d (the cosine similarity).

Manhattan distance (used only by the tiny DESOM configs, [256, 64] distance
matrices) stays on the XLA path — its backward needs a [B, P, D] broadcast
that is trivial at DESOM scale and VMEM-hostile at ViT-SOM scale.

On non-TPU backends the kernel runs in interpreter mode so the CPU test mesh
exercises identical code.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

_PROTO_TILE = 128
_SQRT3_2 = math.sqrt(3.0) / 2.0


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# analytic grid geometry (shared by kernel + backward)
# ---------------------------------------------------------------------------


def _grid_coords(idx, cols: int, topology: str):
    """Prototype flat index -> float (a, b) coordinates whose squared
    differences reproduce ``som.grid_positions`` distances exactly
    (reference ``models/som_layer.py:60-81``)."""
    row = (idx // cols).astype(jnp.float32)
    col = (idx % cols).astype(jnp.float32)
    if topology == "square":
        return row, col
    # hexa: offset x by half on odd rows, compress row pitch to sqrt(3)/2
    odd = jnp.mod(idx // cols, 2).astype(jnp.float32)
    return col + 0.5 * odd, row * _SQRT3_2


def grid_d2_rows(bmu_idx: jnp.ndarray, n_prototypes: int, cols: int, topology: str):
    """[B] BMU indices -> [B, P] squared grid distances, computed
    analytically (no [P, P] table)."""
    pa, pb = _grid_coords(jnp.arange(n_prototypes, dtype=jnp.int32), cols, topology)
    ba, bb = _grid_coords(bmu_idx.astype(jnp.int32), cols, topology)
    da = ba[:, None] - pa[None, :]
    db = bb[:, None] - pb[None, :]
    return da * da + db * db


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _som_kernel(
    x_ref,
    p_ref,
    t_ref,
    dist_ref,
    bmu_ref,
    loss_ref,
    *,
    b_real: int,
    p_real: int,
    proto_tile: int,
    cols: int,
    topology: str,
    distance_fcn: str,
):
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    x = x_ref[...]  # [B_pad, D]
    p_tile = p_ref[...]  # [Pt, D]

    if distance_fcn == "cosine":
        xn = x * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(x * x, axis=1, keepdims=True), 1e-24)
        )
        pn = p_tile * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(p_tile * p_tile, axis=1, keepdims=True), 1e-24)
        )
        d = 1.0 - jnp.dot(xn, pn.T, preferred_element_type=jnp.float32)
    else:  # euclidean
        x2 = jnp.sum(x * x, axis=1, keepdims=True)  # [B_pad, 1]
        p2 = jnp.sum(p_tile * p_tile, axis=1)[None, :]  # [1, Pt]
        cross = jnp.dot(x, p_tile.T, preferred_element_type=jnp.float32)
        d = jnp.sqrt(jnp.maximum(x2 - 2.0 * cross + p2, 0.0))

    off = pl.multiple_of(t * proto_tile, proto_tile)
    dist_ref[:, pl.ds(off, proto_tile)] = d

    @pl.when(t == n_tiles - 1)
    def _finalize():
        b_pad, p_pad = dist_ref.shape
        dist = dist_ref[...]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (b_pad, p_pad), 1)
        col_valid = col_ids < p_real

        # BMU: first index attaining the (column-masked) minimum — matches
        # argmin tie-breaking of the XLA oracle and the reference.
        masked = jnp.where(col_valid, dist, jnp.inf)
        min_d = jnp.min(masked, axis=1, keepdims=True)
        bmu = jnp.min(
            jnp.where(masked == min_d, col_ids, p_real), axis=1, keepdims=True
        )
        bmu_ref[...] = bmu

        # analytic Gaussian neighborhood weights
        pa, pb = _grid_coords(col_ids, cols, topology)
        ba, bb = _grid_coords(jnp.broadcast_to(bmu, (b_pad, p_pad)), cols, topology)
        d2 = (ba - pa) ** 2 + (bb - pb) ** 2
        temp = t_ref[0, 0]
        w = jnp.exp(-d2 / (2.0 * temp * temp))

        row_valid = jax.lax.broadcasted_iota(jnp.int32, (b_pad, p_pad), 0) < b_real
        contrib = jnp.where(
            col_valid & row_valid, w * jnp.where(col_valid, dist, 0.0), 0.0
        )
        loss_ref[0, 0] = jnp.sum(contrib) / (b_real * p_real)


def _forward_impl(
    x: jnp.ndarray,
    prototypes: jnp.ndarray,
    temperature: jnp.ndarray,
    *,
    cols: int,
    topology: str,
    distance_fcn: str,
):
    b, d_dim = x.shape
    p, _ = prototypes.shape
    b_pad = _round_up(b, 8)
    p_pad = _round_up(p, _PROTO_TILE)
    n_tiles = p_pad // _PROTO_TILE

    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
    if p_pad != p:
        prototypes = jnp.pad(prototypes, ((0, p_pad - p), (0, 0)))
    temp = jnp.asarray(temperature, jnp.float32).reshape(1, 1)

    kernel = functools.partial(
        _som_kernel,
        b_real=b,
        p_real=p,
        proto_tile=_PROTO_TILE,
        cols=cols,
        topology=topology,
        distance_fcn=distance_fcn,
    )
    dist, bmu, loss = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b_pad, d_dim), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_PROTO_TILE, d_dim), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, p_pad), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, p_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * p_pad * d_dim,
            bytes_accessed=(b_pad * d_dim + p_pad * d_dim + b_pad * p_pad) * 4,
            transcendentals=b_pad * p_pad,
        ),
        interpret=_use_interpret(),
    )(x, prototypes, temp)

    return loss[0, 0], bmu[:b, 0], dist[:b, :p]


# ---------------------------------------------------------------------------
# custom-VJP op factory
# ---------------------------------------------------------------------------


def make_fused_som(
    map_size: Tuple[int, int], topology: str, distance_fcn: str
):
    """Returns ``fused(x, prototypes, temperature) -> (loss, bmu, distances)``
    with the closed-form backward described in the module docstring.

    Gradient notes: ``bmu`` and ``distances`` are produced for eval/metrics
    and are non-differentiable outputs (the train loss must flow through the
    ``loss`` output, which is how both the reference and the XLA path behave:
    weights are stop-gradient, distances feed the loss mean).
    """
    if distance_fcn not in ("euclidean", "cosine"):
        raise ValueError(
            f"fused SOM kernel supports euclidean/cosine, got {distance_fcn} "
            "(manhattan stays on the XLA path)"
        )
    rows, cols = int(map_size[0]), int(map_size[1])
    n_protos = rows * cols

    fwd = functools.partial(
        _forward_impl, cols=cols, topology=topology, distance_fcn=distance_fcn
    )

    @jax.custom_vjp
    def fused(x, prototypes, temperature):
        return fwd(x, prototypes, temperature)

    def fused_fwd(x, prototypes, temperature):
        loss, bmu, dist = fwd(x, prototypes, temperature)
        return (loss, bmu, dist), (x, prototypes, temperature, bmu, dist)

    def fused_bwd(res, cotangents):
        x, prototypes, temperature, bmu, dist = res
        g = cotangents[0]  # loss cotangent; bmu/dist outputs are residual-only

        b, p = dist.shape
        d2 = grid_d2_rows(bmu, n_protos, cols, topology)
        t = jnp.asarray(temperature, jnp.float32)
        w = jnp.exp(-d2 / (2.0 * t * t))
        c = (g / (b * p)) * w  # [B, P]

        if distance_fcn == "euclidean":
            e = jnp.where(dist > 0.0, c / dist, 0.0)
            dx = x * jnp.sum(e, axis=1, keepdims=True) - e @ prototypes
            dp = prototypes * jnp.sum(e, axis=0)[:, None] - e.T @ x
        else:  # cosine
            xnorm = jnp.linalg.norm(x, axis=1, keepdims=True).clip(1e-12)
            pnorm = jnp.linalg.norm(prototypes, axis=1, keepdims=True).clip(1e-12)
            xn = x / xnorm
            pn = prototypes / pnorm
            s = 1.0 - dist  # cosine similarity
            dx = -(c @ pn - jnp.sum(c * s, axis=1, keepdims=True) * xn) / xnorm
            dp = -(c.T @ xn - jnp.sum(c * s, axis=0)[:, None] * pn) / pnorm

        dt = jnp.zeros_like(jnp.asarray(temperature, jnp.float32)).reshape(
            jnp.shape(temperature)
        )
        return dx.astype(x.dtype), dp.astype(prototypes.dtype), dt

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def make_fused_som_sharded(
    map_size: Tuple[int, int],
    topology: str,
    distance_fcn: str,
    mesh: Mesh,
    axis: str = "data",
):
    """DP-sharded wrapper: runs the fused Pallas kernel per batch shard.

    ``pallas_call`` has no SPMD partitioning rule, so under a >1-device mesh
    plain jit would all-gather its operands. ``shard_map`` instead runs the
    kernel on each device's batch slice: ``x`` splits on ``axis``,
    ``prototypes``/``temperature`` replicate, and the per-shard mean losses
    reduce with ``pmean`` (equal shard sizes — the Trainer enforces
    batch % n_devices == 0 — so mean-of-means == global mean, exactly the
    reference's ``mean(w*d)`` over the full batch,
    ``/root/reference/models/som_layer.py:137-142``). ``bmu``/``distances``
    stay batch-sharded, matching the rest of the step's activations.

    Autodiff goes through ``shard_map``: the per-shard custom VJP produces
    local ``dp`` contributions and the replicated-input transpose inserts the
    psum, so prototype gradients match the single-device kernel (covered by
    tests/test_pallas_kernels.py on the 8-device CPU mesh).
    """
    fused = make_fused_som(map_size, topology, distance_fcn)

    def body(x, prototypes, temperature):
        loss, bmu, dist = fused(x, prototypes, temperature)
        return jax.lax.pmean(loss, axis), bmu, dist

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(), P(axis), P(axis)),
        # pallas_call outputs carry no varying-mesh-axes metadata, so the
        # vma checker can't type them; gradient parity with the 1-device
        # kernel (incl. the psum'd prototype grads) is covered by
        # tests/test_pallas_kernels.py::test_sharded_fused_som*.
        check_vma=False,
    )
