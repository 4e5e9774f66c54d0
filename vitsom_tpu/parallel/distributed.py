"""Multi-host (multi-process) scaffolding: jax.distributed + per-process data.

SURVEY.md §2c prescribes ``jax.distributed`` + a Mesh over ICI (and DCN for
multi-host) as the TPU-native replacement for the reference's latent
Lightning/NCCL default (which is never configured in-repo,
``/root/reference/experiments/benchmarking/train_vit_som.py:44-45``).

Design: every process runs the same program; ``jax.devices()`` is the GLOBAL
device list, so the ('data',) Mesh spans all hosts and pjit/collectives ride
ICI/DCN automatically. What each process must do differently is (a) feed only
its slice of every global batch and (b) write logs/checkpoints once, not
process_count times. The helpers here are that slicing math (unit-tested in
``tests/test_distributed.py``) plus guarded initialization; everything is an
exact no-op in the single-process case, so the hot paths pay nothing.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

_initialized = False


def maybe_initialize() -> None:
    """Initialize the jax.distributed runtime when launched multi-process.

    Triggered by the standard coordinator env vars (set by the launcher):
    ``JAX_COORDINATOR_ADDRESS`` + ``JAX_NUM_PROCESSES`` + ``JAX_PROCESS_ID``
    (jax.distributed.initialize also auto-detects TPU pod metadata when
    args are omitted on Cloud TPU). Idempotent; silent no-op when the env
    says single-process."""
    global _initialized
    if _initialized:
        return
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = int(os.environ.get("JAX_NUM_PROCESSES", "1") or "1")
    if addr is None or n <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=n,
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0") or "0"),
    )
    _initialized = True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns logging/checkpoint writes."""
    return jax.process_index() == 0


def to_host(tree):
    """``jax.device_get`` that also works on REPLICATED global arrays.

    Under multi-host, metric scalars / params coming out of a global-mesh
    jit are not fully addressable, and plain device_get (or ``float()`` /
    ``int()``) raises. Every process holds the full value of a replicated
    array in each addressable shard, so the local shard IS the value.
    Sharded (non-replicated) leaves are rejected loudly — gather those with
    ``jax.experimental.multihost_utils.process_allgather`` instead."""

    def _local(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            shard = a.addressable_shards[0]
            if shard.data.shape != a.shape:
                raise ValueError(
                    f"to_host expects replicated arrays; got shard shape "
                    f"{shard.data.shape} of global {a.shape} — use "
                    "process_allgather for batch-sharded values"
                )
            return shard.data
        return a

    return jax.device_get(jax.tree_util.tree_map(_local, tree))


# ---------------------------------------------------------------------------
# slicing math (pure, unit-tested)
# ---------------------------------------------------------------------------


def local_span(global_n: int, pidx: int, pcount: int) -> slice:
    """The contiguous row span process ``pidx`` of ``pcount`` owns in a
    globally [global_n, ...] batch-sharded array.

    Requires an even split — the Trainer already enforces
    batch_size % n_devices == 0, and n_devices is a multiple of
    process_count, so every global batch splits evenly. For whole DATASETS
    (scan mode) the caller must truncate to a multiple first
    (``truncate_to_multiple``)."""
    if global_n % pcount != 0:
        raise ValueError(
            f"global size {global_n} does not split evenly over {pcount} "
            "processes; truncate_to_multiple first"
        )
    per = global_n // pcount
    return slice(pidx * per, (pidx + 1) * per)


def truncate_to_multiple(n: int, pcount: int) -> int:
    """Largest n' <= n with n' % pcount == 0 (drop_last semantics across
    hosts, mirroring the reference's per-batch drop_last,
    ``/root/reference/data/data.py:387-389``)."""
    return (n // pcount) * pcount


def local_batch_indices(global_idx: np.ndarray, pidx: int, pcount: int) -> np.ndarray:
    """Slice a global batch's example indices down to this process's rows.

    Every process computes the SAME global permutation (same seed), then
    takes its span — so the global batch seen by the model is identical to
    the single-process run's, just materialized host-by-host."""
    return global_idx[local_span(len(global_idx), pidx, pcount)]


def form_global_batch(local_tree, mesh) -> Dict:
    """Assemble per-process local arrays into global jax.Arrays sharded on
    the batch axis of ``mesh``. Leaves are [local_batch, ...] host numpy;
    the result behaves exactly like a device_put of the full global batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))

    def _form(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(_form, local_tree)


def form_global_stacked(local_tree, mesh) -> Dict:
    """Same as ``form_global_batch`` for [steps, local_batch, ...] stacks
    (steps replicated, batch axis sharded)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(None, "data"))

    def _form(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(_form, local_tree)
