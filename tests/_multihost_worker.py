"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Launched as ``python tests/_multihost_worker.py <out_json>`` with the
jax.distributed coordinator env vars set by the parent:
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, plus
XLA_FLAGS=--xla_force_host_platform_device_count=4 so the 2 processes form
an 8-device global CPU mesh. Trains a tiny ViT-SOM through the REAL Trainer
(scan mode, shard_map'd fused SOM path on the multi-device mesh) and runs
the sharded evaluators; results go to ``out_json`` for the parent to compare
against a single-process 8-device run of the same seed.
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

# the image's sitecustomize force-registers the axon TPU backend; both
# worker processes must stay off the (single) real chip
jax.config.update("jax_platforms", "cpu")


def main(out_json: str):
    from vitsom_tpu.parallel import distributed as dist

    dist.maybe_initialize()
    assert jax.process_count() == int(os.environ["JAX_NUM_PROCESSES"])
    assert len(jax.devices()) == 8, jax.devices()

    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

    cfg = load_config(
        "configs/vit_som/vit_som_mnist.yaml",
        overrides=dict(MULTIHOST_TEST_OVERRIDES),
    )
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm, run_id=0)
    fit = trainer.fit(progress=False)
    metrics = trainer.evaluate()
    vm, km = _extra_evals(trainer, dm)
    result = {
        "process_index": jax.process_index(),
        "final_step": fit["final_step"],
        "purity": metrics["purity"],
        "nmi": metrics["nmi"],
        "history_total_loss": trainer.logger.history.get("train/total_loss"),
        "val_metrics": vm,
        "kmeans": km,
    }
    with open(out_json, "w") as f:
        json.dump(result, f)
    print(f"worker {jax.process_index()} done: {result}")


def _extra_evals(trainer, dm):
    """Exercise the remaining sharded evaluators (validation_metrics loss
    gathering + evaluate_kmeans) — shared with the parent's single-process
    control run so both paths are parity-checked. The latent step wraps the
    trained model's CLS token so kmeans needs no second model family."""
    from vitsom_tpu.eval import evaluate as eval_lib

    vm = eval_lib.validation_metrics(
        trainer.eval_fn(), trainer.state.params, dm, dm.train,
        temperature=trainer.current_temperature(),
        batch_stats=trainer.state.batch_stats,
    )
    model = trainer.model

    def latent_step(params, batch, temperature, batch_stats=None):
        cls_tok, *_ = model.apply({"params": params}, batch["image"])
        return {"latent": cls_tok}

    km_p, km_n, km_dt = eval_lib.evaluate_kmeans(
        jax.jit(latent_step), trainer.state.params, dm,
        temperature=trainer.current_temperature(),
        batch_stats=trainer.state.batch_stats,
    )
    return (
        {k: float(v) for k, v in vm.items()},
        {"purity": float(km_p), "nmi": float(km_n), "dt": float(km_dt)},
    )


# shared by worker and the parent's single-process control run
MULTIHOST_TEST_OVERRIDES = (
    ("total_epochs", 2),
    ("batch_size", 16),
    ("som.map_size", (4, 4)),
    ("vit.depth", 2),
    ("vit.emb_dim", 16),
    ("vit.heads", 2),
    ("vit.dec_depth", 1),
    ("data.allow_synthetic", True),
    ("data.synthetic_size", 64),
    ("train.n_runs", 1),
    ("train.use_pallas_som", True),
    ("train.checkpoint_dir", "/tmp/vitsom_multihost_test/states"),
    ("train.log_dir", "/tmp/vitsom_multihost_test/logs"),
)


if __name__ == "__main__":
    main(sys.argv[1])
