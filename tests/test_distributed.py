"""Multi-host scaffolding: slicing math + global-array assembly.

Single-process unit tests for the pure pieces (span math,
``make_array_from_process_local_data`` shapes/shardings). The REAL
2-process ``jax.distributed`` execution — training through the Trainer and
the sharded evaluators, with single-process parity — lives in
``tests/test_multihost.py``.
"""

import numpy as np
import pytest

from vitsom_tpu.parallel import distributed as dist


def test_local_span_partitions_exactly():
    n, pc = 64, 8
    spans = [dist.local_span(n, i, pc) for i in range(pc)]
    covered = np.concatenate([np.arange(n)[s] for s in spans])
    np.testing.assert_array_equal(covered, np.arange(n))
    sizes = {s.stop - s.start for s in spans}
    assert sizes == {n // pc}


def test_local_span_rejects_uneven():
    with pytest.raises(ValueError):
        dist.local_span(65, 0, 8)


def test_truncate_to_multiple():
    assert dist.truncate_to_multiple(70000, 8) == 70000
    assert dist.truncate_to_multiple(70001, 8) == 70000
    assert dist.truncate_to_multiple(69999, 8) == 69992
    assert dist.truncate_to_multiple(64, 8) == 64
    assert dist.truncate_to_multiple(7, 8) == 0


def test_local_batch_indices_reassemble_global_batch():
    """Every process slicing the SAME global permutation must reproduce the
    single-process batch exactly when concatenated in process order."""
    rng = np.random.default_rng(3)
    global_idx = rng.permutation(128)
    pc = 8
    parts = [dist.local_batch_indices(global_idx, i, pc) for i in range(pc)]
    np.testing.assert_array_equal(np.concatenate(parts), global_idx)


def test_form_global_batch_shapes_and_values():
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    y = np.arange(16, dtype=np.int32)
    out = dist.form_global_batch({"image": x, "label": y}, mesh)
    assert out["image"].shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(out["image"]), x)
    np.testing.assert_array_equal(np.asarray(out["label"]), y)
    # sharded over the batch axis
    assert out["image"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_form_global_stacked_shapes():
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    x = np.zeros((4, 16, 3), np.float32)  # [steps, batch, ...]
    out = dist.form_global_stacked({"image": x}, mesh)
    assert out["image"].shape == (4, 16, 3)
    assert out["image"].sharding.spec == jax.sharding.PartitionSpec(None, "data")


def test_maybe_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    dist.maybe_initialize()  # must not raise or initialize anything
    assert dist.process_count() == 1
    assert dist.is_primary()
