"""Checkpoint evaluation harness behind ``make test model=<m> dataset=<d>``.

Working re-design of the reference's stale script-tests
(``/root/reference/experiments/tests/test_vit_som.py``, ``test_desom.py`` —
both point at configs that don't exist and call removed APIs): load a config
and a saved checkpoint, then report

- clustering: purity, NMI, quantization error, topographic error, k-means
  purity/NMI on the latents, plus qualitative figures (decoded-prototype
  grid for vit_som, label heatmap, latent projection)
- classification: accuracy / macro precision / recall / F1

Usage:
    python experiments/tests/eval_checkpoint.py --config configs/vit_som/vit_som_mnist.yaml
    python experiments/tests/eval_checkpoint.py --checkpoint experiments/states/vit_som/mnist_run0_last
    ... [--tag last|best] [--synthetic] [--figures-dir img/]

With ``--checkpoint`` the config embedded in the checkpoint directory is
used (``save_hyperparameters`` parity, reference ``models/vit_som.py:26``)
— no ``--config`` needed and no config/checkpoint drift possible; passing
both restores from the explicit directory while the trainer's structural
config check guards the mismatch.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="vitsom-tpu checkpoint evaluation")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="checkpoint directory; its embedded config is "
                             "used when --config is absent")
    parser.add_argument("--tag", type=str, default="last", help="checkpoint tag (last/best)")
    parser.add_argument("--run-id", type=int, default=0)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--figures-dir", type=str, default=None,
                        help="write qualitative figures here (clustering only)")
    parser.add_argument("--no-kmeans", action="store_true")
    parser.add_argument("--override", action="append", default=[],
                        help="dotted config override key=value (yaml-parsed)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.eval import evaluate as eval_lib
    from vitsom_tpu.eval import metrics as metrics_lib
    from vitsom_tpu.train.trainer import Trainer

    import yaml

    overrides = {"data.allow_synthetic": True} if args.synthetic else {}
    for ov in args.override:
        k, _, v = ov.partition("=")
        overrides[k] = yaml.safe_load(v)
    if args.config is not None:
        cfg = load_config(args.config, overrides=overrides or None)
    elif args.checkpoint is not None:
        from vitsom_tpu.config import apply_overrides
        from vitsom_tpu.train.trainer import load_checkpoint_config

        cfg = load_checkpoint_config(args.checkpoint)
        if cfg is None:
            parser.error(
                f"no embedded config in {args.checkpoint} (pre-embedding "
                f"checkpoint) — pass --config"
            )
        if overrides:
            cfg = apply_overrides(cfg, overrides).validate()
    else:
        parser.error("one of --config / --checkpoint is required")
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm, run_id=args.run_id)
    trainer.restore_checkpoint(tag=args.tag, path=args.checkpoint)
    print(f"restored {cfg.model_arch}/{cfg.data.dataset} checkpoint "
          f"'{args.tag}' at step {int(trainer.state.step)}")

    results = trainer.evaluate()
    for k, v in results.items():
        print(f"{k}: {v:.4f}")

    if cfg.classification:
        return results

    # SOM quality metrics from one eval pass over the train (concat) set
    temperature = trainer.current_temperature()
    images, labels = dm.device_arrays(dm.train, train_mode=True)
    bs = cfg.batch_size
    n_keep = ((len(dm.train) // bs) * bs) or len(dm.train)
    out = eval_lib._batched_device_eval(
        trainer.eval_fn(), trainer.state.params,
        images[:n_keep], labels[:n_keep], bs, temperature, keys=("bmu",),
        batch_stats=trainer.state.batch_stats,
    )
    bmu = out["bmu"]
    y = np.asarray(labels[:n_keep])

    # distances for QE/TE on a bounded sample (matrix is [n, P])
    n_sample = min(n_keep, 8192)
    model = trainer.model
    if cfg.model_arch == "vit_som":
        @jax.jit
        def dist_fn(params, x):
            _, _, _, distances, _ = model.apply({"params": params}, x)
            return distances
    else:
        @jax.jit
        def dist_fn(params, x):
            _, _, distances, _ = model.apply(
                {"params": params}, x.reshape(x.shape[0], -1)
            )
            return distances
    dists = np.concatenate([
        np.asarray(dist_fn(trainer.state.params, images[s : s + bs]))
        for s in range(0, n_sample, bs)
    ])
    qe = metrics_lib.quantization_error(dists)
    te = metrics_lib.topographic_error(dists, cfg.som.map_size, cfg.som.topology)
    print(f"quantization_error: {qe:.4f}")
    print(f"topographic_error: {te:.4f}")
    results.update({"quantization_error": qe, "topographic_error": te})

    if not args.no_kmeans and cfg.model_arch == "desom":
        from vitsom_tpu.train import steps as steps_lib

        eval_step = steps_lib.make_desom_eval_step(cfg, model)
        kp, kn, _ = eval_lib.evaluate_kmeans(
            jax.jit(eval_step), trainer.state.params, dm, temperature=temperature,
            batch_stats=trainer.state.batch_stats,
        )
        results.update({"kmeans_purity": kp, "kmeans_nmi": kn})

    if args.figures_dir:
        from vitsom_tpu.eval import viz

        os.makedirs(args.figures_dir, exist_ok=True)
        stem = f"{cfg.model_arch}_{cfg.data.dataset}"
        viz.visualize_label_heatmap(
            bmu, y, cfg.som.map_size,
            os.path.join(args.figures_dir, f"{stem}_heatmap.png"),
        )
        if cfg.model_arch == "vit_som" and not cfg.som.use_reduced:
            viz.visualize_decoded_prototypes(
                model, trainer.state.params, cfg,
                os.path.join(args.figures_dir, f"{stem}_prototypes.png"),
            )

        @jax.jit
        def latent_fn(params, x):
            if cfg.model_arch == "vit_som":
                return model.apply({"params": params}, x, method="get_latent_representation")
            return model.apply({"params": params}, x.reshape(x.shape[0], -1))[1]

        lat = np.concatenate([
            np.asarray(latent_fn(trainer.state.params, images[s : s + bs]))
            for s in range(0, min(n_keep, 4096), bs)
        ])
        viz.visualize_latent_projection(
            lat, y[: len(lat)],
            os.path.join(args.figures_dir, f"{stem}_latents.png"),
        )
        print(f"figures written to {args.figures_dir}")

    return results


if __name__ == "__main__":
    main()
