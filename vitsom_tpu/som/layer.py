"""Pure-JAX Self-Organizing Map core.

Functional re-design of the reference SOM layer
(``/root/reference/models/som_layer.py:12-152``). Instead of a stateful
module, the SOM is a parameter array plus pure functions, all jit/grad/vmap
friendly:

- ``init_prototypes``        — uniform init, row-normalized for cosine
                               (reference :44-57)
- ``grid_positions``         — square/hexa topology tables (reference :60-81)
- ``grid_sq_distances``      — static [P, P] pairwise squared grid distances.
  The reference recomputes ``exp(-|g_i - g_bmu|^2 / 2T^2)`` through a
  [B, P, 2] broadcast every step (reference :148-151); on TPU we precompute
  the [P, P] table once and the per-step work collapses to a gather + exp.
- ``compute_distances``      — manhattan / euclidean / cosine (reference :111-125)
- ``bmu``                    — argmin over prototypes (reference :88)
- ``neighborhood_weights``   — Gaussian weights via table gather (reference :144-151)
- ``som_loss``               — mean of weighted distances (reference :137-142)
- ``temperature_schedule``   — exponential Tmax->Tmin decay (reference :127-132;
  the reference docstring says "cosine" but the code is exponential — the
  code's behavior is what we replicate)

All shapes are static; everything lives inside the jitted train step.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitsom_tpu.config import SOMConfig


# ---------------------------------------------------------------------------
# static tables (host-side numpy; computed once per model build)
# ---------------------------------------------------------------------------


def grid_positions(map_size: Tuple[int, int], topology: str = "square") -> np.ndarray:
    """[P, 2] float32 grid coordinates for each prototype.

    Square: (row, col). Hexa: offset coordinates with sqrt(3)/2 row pitch,
    matching reference ``create_grid_positions`` (:60-81) exactly — note the
    reference stores square positions as (y, x) but hexa as (x_offset, y) —
    we replicate both orderings since only pairwise distances matter.
    """
    rows, cols = map_size
    n = rows * cols
    if topology == "square":
        gy, gx = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
        pos = np.stack([gy, gx], axis=-1).reshape(-1, 2).astype(np.float32)
    elif topology == "hexa":
        pos = np.zeros((n, 2), dtype=np.float32)
        idx = np.arange(n)
        row = idx // cols
        col = idx % cols
        pos[:, 0] = col + 0.5 * (row % 2 == 1)
        pos[:, 1] = row * math.sqrt(3.0) / 2.0
    else:
        raise ValueError(f"Unsupported topology: {topology}")
    return pos


def grid_sq_distances(map_size: Tuple[int, int], topology: str = "square") -> np.ndarray:
    """Static [P, P] matrix of squared grid distances between prototypes."""
    pos = grid_positions(map_size, topology)
    diff = pos[:, None, :] - pos[None, :, :]
    return np.sum(diff * diff, axis=-1).astype(np.float32)


def index_to_position(indices: jnp.ndarray, map_size: Tuple[int, int]) -> jnp.ndarray:
    """Flat prototype index -> (row, col) float coords (reference :134-135)."""
    return jnp.stack(
        [indices // map_size[1], indices % map_size[1]], axis=1
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------


def init_prototypes(key: jax.Array, som: SOMConfig, latent_dim: int) -> jnp.ndarray:
    """Uniform [0,1) init; L2-row-normalized for cosine (reference :44-57)."""
    protos = jax.random.uniform(key, (som.n_prototypes, latent_dim), dtype=jnp.float32)
    if som.distance_fcn == "cosine":
        protos = protos / jnp.linalg.norm(protos, axis=1, keepdims=True).clip(1e-12)
    return protos


# ---------------------------------------------------------------------------
# distances / BMU / weights / loss
# ---------------------------------------------------------------------------


def compute_distances(
    x: jnp.ndarray, prototypes: jnp.ndarray, distance_fcn: str
) -> jnp.ndarray:
    """[B, P] distances between inputs and prototypes (reference :111-125).

    cosine and euclidean are expressed through a single [B, D] x [D, P]
    matmul so the FLOPs land on the MXU; manhattan needs the [B, P, D]
    broadcast (tiny for the DESOM configs that use it).
    """
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    if distance_fcn == "manhattan":
        return jnp.sum(jnp.abs(x[:, None, :] - prototypes[None, :, :]), axis=-1)
    if distance_fcn == "euclidean":
        # ||x||^2 - 2 x.p + ||p||^2, clipped for numerical safety
        x2 = jnp.sum(x * x, axis=1, keepdims=True)
        p2 = jnp.sum(prototypes * prototypes, axis=1)[None, :]
        cross = x @ prototypes.T
        sq = jnp.maximum(x2 - 2.0 * cross + p2, 0.0)
        return jnp.sqrt(sq)
    if distance_fcn == "cosine":
        xn = x / jnp.linalg.norm(x, axis=1, keepdims=True).clip(1e-12)
        pn = prototypes / jnp.linalg.norm(prototypes, axis=1, keepdims=True).clip(1e-12)
        return 1.0 - xn @ pn.T
    raise ValueError(f"Unsupported distance function: {distance_fcn}")


def bmu(distances: jnp.ndarray) -> jnp.ndarray:
    """Best-matching-unit indices, [B] int32 (reference :88)."""
    return jnp.argmin(distances, axis=1).astype(jnp.int32)


def neighborhood_weights(
    bmu_indices: jnp.ndarray, grid_sq_dist: jnp.ndarray, temperature: jnp.ndarray
) -> jnp.ndarray:
    """Gaussian neighborhood weights, [B, P] (reference :144-151).

    ``grid_sq_dist`` is the static [P, P] table; the per-step cost is one
    row-gather and one exp. Weights depend on inputs only through the integer
    BMU index, so no gradient flows through them — same effective autograd
    behavior as the reference (argmin is piecewise constant).
    """
    d2 = grid_sq_dist[bmu_indices]  # [B, P]
    t2 = 2.0 * temperature * temperature
    return jnp.exp(-d2 / t2)


def som_loss(weights: jnp.ndarray, distances: jnp.ndarray) -> jnp.ndarray:
    """Mean of weighted distances (reference :137-142)."""
    return jnp.mean(weights * distances)


def temperature_schedule(
    iteration: jnp.ndarray, total_iterations: float, t_max: float, t_min: float
) -> jnp.ndarray:
    """Exponential Tmax -> Tmin decay (reference :127-132).

    ``total_iterations`` replicates the reference's float formula
    ``(len(dataset) / batch_size) * total_epochs`` — NOT the drop_last step
    count — so temperatures match step for step.
    """
    frac = iteration.astype(jnp.float32) / (total_iterations - 1.0)
    return t_max * (t_min / t_max) ** frac


def total_iterations(dataset_len: int, batch_size: int, total_epochs: int) -> float:
    """Reference ``update_temperature`` denominator (:131)."""
    return (dataset_len / batch_size) * total_epochs


# ---------------------------------------------------------------------------
# fused step: the SOM hot path as one call
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("distance_fcn",))
def som_forward(
    x: jnp.ndarray,
    prototypes: jnp.ndarray,
    grid_sq_dist: jnp.ndarray,
    temperature: jnp.ndarray,
    distance_fcn: str = "cosine",
):
    """distances, bmu, weights, loss in one jitted call (XLA-fused path).

    The Pallas-fused variant lives in ``vitsom_tpu.ops.som_kernel``; this is
    the reference oracle and the default (XLA already fuses the matmul +
    argmin + gather + reduction chain well on TPU).
    """
    distances = compute_distances(x, prototypes, distance_fcn)
    bmu_idx = bmu(distances)
    weights = neighborhood_weights(bmu_idx, grid_sq_dist, temperature)
    loss = som_loss(jax.lax.stop_gradient(weights), distances)
    return distances, bmu_idx, weights, loss
