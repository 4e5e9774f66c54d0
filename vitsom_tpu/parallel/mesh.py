"""Device mesh + sharding helpers (batch-axis data parallelism).

The reference has no first-class distribution — Lightning's ``devices`` env
pass-through is its whole story (``/root/reference/experiments/benchmarking/
train_vit_som.py:44-45``). Here DP is first-class: a 1-D ``('data',)`` Mesh,
params replicated (models are <=5.4M params), batches sharded on the leading
axis, and XLA inserts the gradient psum. ``devices=N`` means pjit over N
chips over ICI; the same code path runs on the 8-virtual-device CPU mesh in
tests and in ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def is_single_device(mesh: Mesh) -> bool:
    return mesh.devices.size == 1


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Constrain the leading axis of every leaf to the data axis.

    No-op on a 1-device mesh: SPMD constraints on a single chip trigger the
    partitioner's copy-insertion and cost real wall-clock (measured ~8x per
    epoch inside lax.scan on v5e) while being semantically vacuous.
    """
    if is_single_device(mesh):
        return batch
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.lax.with_sharding_constraint(x, s), batch)


def shard_stacked_batches(batches, mesh: Mesh):
    """Constrain [steps, batch, ...] epoch stacks: steps replicated, batch
    axis sharded on 'data'.

    Apply this ONCE on the stacked arrays outside ``lax.scan``, never inside
    the body — the scan slices inherit the sharding, and a per-step
    ``with_sharding_constraint`` defeats XLA loop optimization. No-op on a
    1-device mesh (see ``shard_batch``).
    """
    if is_single_device(mesh):
        return batches
    s = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.lax.with_sharding_constraint(x, s), batches)


def canonical_state_sharding(mesh: Mesh):
    """The ONE sharding every train-state leaf uses — as jit input AND
    (via out_shardings) jit output.

    jit caches on input shardings: when the initial state's leaves carry a
    different sharding object than the state the jit returns (eager-created
    scalars vs GSPMD/NamedSharding outputs), the SECOND dispatch retraces
    and recompiles the entire epoch program — measured as a 24.7 s silent
    recompile through the TPU tunnel. Pinning both sides to this sharding
    makes dispatch 2..N cache hits by construction."""
    if is_single_device(mesh):
        return jax.sharding.SingleDeviceSharding(mesh.devices.flat[0])
    return replicated(mesh)


def put_replicated(tree, mesh: Mesh):
    """Replicate a pytree across the mesh (plain single-device put on a
    1-device mesh — NamedSharding placement there makes every downstream jit
    compile through the SPMD partitioner for nothing)."""
    if is_single_device(mesh):
        return jax.device_put(tree, mesh.devices.flat[0])
    return jax.device_put(tree, replicated(mesh))


def put_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_sharding(mesh))
