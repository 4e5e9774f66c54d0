"""First-party TensorBoard event writer: spec-compatibility tests.

The writer replaces torch.utils.tensorboard (15-20 s import per process).
Compatibility is proven two ways: (a) crc-validated round-trip through our
own parser, (b) when the real tensorboard package is importable, its
EventAccumulator must read our files byte-for-spec.
"""

import numpy as np
import pytest

from vitsom_tpu.utils.tb_writer import (
    EventFileWriter,
    crc32c,
    read_scalar_events,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for Castagnoli CRC
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("train/total_loss", 0.5, global_step=1)
    w.add_scalar("train/total_loss", 0.25, global_step=2)
    w.add_scalar("val/accuracy", 0.9, global_step=2)
    w.close()

    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    rows = read_scalar_events(str(files[0]))
    assert ("train/total_loss", 1, pytest.approx(0.5)) == rows[0]
    assert ("train/total_loss", 2, pytest.approx(0.25)) == rows[1]
    assert ("val/accuracy", 2, pytest.approx(0.9)) == rows[2]


def test_tensorboard_reads_our_files(tmp_path):
    """The REAL tensorboard reader accepts our event file (scalars + image)."""
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator"
    )
    w = EventFileWriter(str(tmp_path))
    for step, v in enumerate([1.0, 0.5, 0.125]):
        w.add_scalar("train/recon_loss", v, global_step=step)
    w.add_image(
        "images/input", np.random.default_rng(0).uniform(size=(8, 8, 3)),
        global_step=2,
    )
    w.close()

    acc = ea_mod.EventAccumulator(str(tmp_path))
    acc.Reload()
    assert "train/recon_loss" in acc.Tags()["scalars"]
    scalars = acc.Scalars("train/recon_loss")
    assert [s.step for s in scalars] == [0, 1, 2]
    assert [s.value for s in scalars] == pytest.approx([1.0, 0.5, 0.125])
    assert "images/input" in acc.Tags()["images"]


def test_metric_logger_uses_first_party_writer(tmp_path):
    import sys

    from vitsom_tpu.utils.logging import MetricLogger

    logger = MetricLogger(str(tmp_path))
    logger.log_scalars({"train/total_loss": 1.5}, step=7)
    logger.close()
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert files, "MetricLogger must write first-party event files"
    rows = read_scalar_events(str(files[0]))
    assert ("train/total_loss", 7, pytest.approx(1.5)) in rows
    # and the whole point: no torch import on the logging path
    assert "torch.utils.tensorboard" not in sys.modules
