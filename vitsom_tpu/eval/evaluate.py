"""Evaluation drivers: clustering (BMU purity/NMI), classification, k-means.

Mirrors the reference's evaluators (``/root/reference/tools/evaluation.py``):
- ``evaluate_clustering`` (:18-52): full forward over the loader, BMU index
  as cluster id, purity + NMI + wall-clock
- ``evaluate_classification`` (:93-128): argmax logits -> accuracy/macro-PRF
- ``evaluate_kmeans`` (:54-91): k-means (k = #classes) on the latents

TPU-native differences: batches are evaluated by one jitted forward with a
single host transfer of the small outputs per batch (the reference pulls
``.cpu().numpy()`` inside the timed loop too, :41-42 — but also re-loads and
re-transforms images in Python workers; here static datasets are already
device-resident).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitsom_tpu.config import Config
from vitsom_tpu.data.pipeline import DataModule, Split


_EVAL_SCAN_CACHE: Dict = {}


def _batched_device_eval(
    eval_step: Callable, params, images: jnp.ndarray, labels: jnp.ndarray,
    batch_size: int, temperature, keys=("bmu", "logits"), batch_stats=None,
):
    """Evaluate a device-resident array split as ONE scanned program.

    The tail partial batch is padded (and trimmed after), so every shape is
    static. The whole pass is a single dispatch + a single device->host
    transfer — a per-batch Python loop costs a tunnel round-trip per batch
    (~90 ms each) and dominated the reported inference time.

    ``batch_stats`` (BatchNorm models) is a TRACED argument of the cached
    scan, not a closure capture — a fresh eval closure per batch_stats value
    would recompile the whole scan on every eval (30-190 s each through the
    tunnel). The cache key holds the eval_step OBJECT (hashable by identity);
    ``id()`` keys alias after GC recycling when two trainers live in one
    process.
    """
    n = images.shape[0]
    steps = (n + batch_size - 1) // batch_size
    pad = steps * batch_size - n
    if pad:
        images = jnp.concatenate([images, jnp.repeat(images[:1], pad, axis=0)])
        labels = jnp.concatenate([labels, jnp.zeros((pad,), labels.dtype)])

    cache_key = (eval_step, images.shape, batch_size, keys)
    scan_fn = _EVAL_SCAN_CACHE.get(cache_key)
    if scan_fn is None:

        def eval_all(params, images, labels, temperature, batch_stats):
            batched = {
                "image": images.reshape((steps, batch_size) + images.shape[1:]),
                "label": labels.reshape(steps, batch_size),
            }

            def body(carry, batch):
                o = eval_step(params, batch, temperature, batch_stats)
                return carry, {k: o[k] for k in keys if k in o}

            _, outs = jax.lax.scan(body, None, batched)
            return outs

        scan_fn = jax.jit(eval_all)
        _EVAL_SCAN_CACHE[cache_key] = scan_fn

    outs = jax.device_get(scan_fn(params, images, labels, temperature, batch_stats))
    # per-example outputs ([steps, bs, ...]) flatten and trim the pad;
    # per-BATCH scalars ([steps] — the eval losses) pass through as-is
    # (when pad > 0 the last entry includes the padded rows; validation
    # drops the ragged tail, so the means it reports are pad-free)
    return {
        k: (
            np.asarray(v).reshape((steps * batch_size,) + v.shape[2:])[:n]
            if v.ndim >= 2 and v.shape[1] == batch_size
            else np.asarray(v)
        )
        for k, v in outs.items()
    }


def _multihost() -> bool:
    return jax.process_count() > 1


def _to_process_local(tree):
    """Replicated global arrays -> process-local host copies, so each
    process can run its eval span as an ordinary local program (params /
    batch_stats / temperature are replicated under the DP-only design)."""
    from vitsom_tpu.parallel import distributed as dist

    return dist.to_host(tree)


def _local_eval_span(dm: DataModule, split: Split, train_mode: bool):
    """This process's contiguous row span of a split, as transformed host
    arrays (SURVEY.md:288-290: each process scores its span; metrics reduce
    via a process gather). The split is truncated to a multiple of
    process_count so spans are equal-sized (allgather requirement — global
    drop_last semantics)."""
    from vitsom_tpu.parallel import distributed as dist

    pcount, pidx = jax.process_count(), jax.process_index()
    n = dist.truncate_to_multiple(len(split), pcount)
    span = dist.local_span(n, pidx, pcount)
    local = Split(split.x[span], split.y[span], split.train_mode)
    return dm._host_arrays(local, train_mode)


def _multihost_span_eval(
    eval_step, params, dm: DataModule, split: Split, train_mode: bool,
    temperature, batch_stats, keys,
):
    """Sharded evaluation: every process scores its span of the split with
    a local scanned program, then the small per-example outputs (BMU ids /
    logits) allgather across processes. Returns (outputs_dict, y_true, dt);
    outputs are GLOBAL (identical on every process)."""
    from jax.experimental import multihost_utils

    bs = dm.cfg.batch_size
    x, y = _local_eval_span(dm, split, train_mode)
    params = _to_process_local(params)
    batch_stats = _to_process_local(batch_stats)
    temperature = (
        _to_process_local(temperature) if temperature is not None else None
    )
    images, labels = jnp.asarray(x), jnp.asarray(y)
    # warm before timing (see evaluate_clustering)
    _batched_device_eval(
        eval_step, params, images, labels, bs, temperature, keys=keys,
        batch_stats=batch_stats,
    )
    start = time.time()
    res = _batched_device_eval(
        eval_step, params, images, labels, bs, temperature, keys=keys,
        batch_stats=batch_stats,
    )
    gathered = multihost_utils.process_allgather(
        {**res, "label": np.asarray(y)}, tiled=True
    )
    dt = time.time() - start
    gathered = {k: np.asarray(v) for k, v in gathered.items()}
    y_true = gathered.pop("label")
    return gathered, y_true, dt


def evaluate_clustering(
    eval_step: Callable,
    params,
    dm: DataModule,
    temperature,
    drop_last: bool = True,
    batch_stats=None,
) -> Tuple[float, float, float]:
    """BMU-as-cluster purity/NMI over the training (concat) set, matching
    the reference's protocol (``train_vit_som.py:111-112``)."""
    from vitsom_tpu.eval import metrics

    if _multihost():
        outs, y_true, dt = _multihost_span_eval(
            eval_step, params, dm, dm.train, True, temperature, batch_stats,
            keys=("bmu",),
        )
        p = metrics.purity(y_true, outs["bmu"])
        n = metrics.nmi(y_true, outs["bmu"])
        print(f"Purity: {p:.3f}, NMI: {n:.3f}, Inference Time: {dt:.3f}")
        return p, n, dt

    bs = dm.cfg.batch_size
    split = dm.train
    n_keep = (len(split) // bs) * bs if drop_last else len(split)
    if n_keep == 0:  # split smaller than one batch: evaluate all (padded)
        n_keep = len(split)

    if dm.is_static:
        # device arrays are cached on the split (usually already resident
        # from training); warm the eval scan BEFORE the timer so the
        # reported inference time is execution, not XLA compile + the
        # first-execution upload penalty — the reference's eager-torch
        # number has neither (tools/evaluation.py:26-49 times a warm GPU).
        images, labels = dm.device_arrays(split, train_mode=True)
        _batched_device_eval(
            eval_step, params, images[:n_keep], labels[:n_keep], bs,
            temperature, batch_stats=batch_stats,
        )
        start = time.time()
        res = _batched_device_eval(
            eval_step, params, images[:n_keep], labels[:n_keep], bs,
            temperature, batch_stats=batch_stats,
        )
        y_pred, y_true = res["bmu"], np.asarray(labels[:n_keep])
    else:
        start = time.time()
        preds, trues = [], []
        for batch in dm.eval_batches(split, drop_last=drop_last):
            o = eval_step(params, jax.device_put(batch), temperature, batch_stats)
            preds.append(o["bmu"])  # stays on device; one transfer below
            trues.append(batch["label"])
        y_pred = np.concatenate(jax.device_get(preds))
        y_true = np.concatenate(trues)

    p = metrics.purity(y_true, y_pred)
    n = metrics.nmi(y_true, y_pred)
    dt = time.time() - start
    print(f"Purity: {p:.3f}, NMI: {n:.3f}, Inference Time: {dt:.3f}")
    return p, n, dt


def evaluate_classification(
    eval_step: Callable,
    params,
    dm: DataModule,
    split: Optional[Split] = None,
    temperature=None,
    drop_last: bool = True,
    batch_stats=None,
) -> Tuple[float, float, float, float, float]:
    """Accuracy/precision/recall/F1 on the test split (reference :93-128)."""
    from vitsom_tpu.eval import metrics

    split = split if split is not None else dm.test
    if _multihost():
        t = temperature if temperature is not None else jnp.asarray(1.0)
        outs, y_true, dt = _multihost_span_eval(
            eval_step, params, dm, split, False, t, batch_stats,
            keys=("logits",),
        )
        m = metrics.classification_metrics(
            y_true, np.argmax(outs["logits"], axis=-1)
        )
        print(
            f"Accuracy: {m['accuracy']:.3f}, Precision: {m['precision']:.3f}, "
            f"Recall: {m['recall']:.3f}, F1-score: {m['f1']:.3f}, "
            f"Inference Time: {dt:.3f}"
        )
        return m["accuracy"], m["precision"], m["recall"], m["f1"], dt
    t = temperature if temperature is not None else jnp.asarray(1.0)
    # keep the ragged tail batch: splits smaller than one batch (small val
    # sets) must still evaluate — one extra jit specialization, once
    if len(split) < dm.cfg.batch_size:
        drop_last = False

    if isinstance(split.x, np.ndarray) and split.x.dtype != object:
        # uniform source: eval-transform once (cached on the split), then
        # ONE scanned program — the per-batch dispatch loop costs a tunnel
        # RTT per batch (~7 s for the CIFAR test split alone). Warm before
        # timing (see evaluate_clustering).
        bs = dm.cfg.batch_size
        n_keep = (len(split) // bs) * bs if drop_last else len(split)
        images, labels = dm.device_arrays(split, train_mode=False)
        _batched_device_eval(
            eval_step, params, images[:n_keep], labels[:n_keep], bs, t,
            keys=("logits",), batch_stats=batch_stats,
        )
        start = time.time()
        res = _batched_device_eval(
            eval_step, params, images[:n_keep], labels[:n_keep], bs, t,
            keys=("logits",), batch_stats=batch_stats,
        )
        y_pred = np.argmax(res["logits"], axis=-1)
        y_true = np.asarray(labels[:n_keep])
    else:
        start = time.time()
        preds, trues = [], []
        for batch in dm.eval_batches(split, drop_last=drop_last):
            o = eval_step(params, jax.device_put(batch), t, batch_stats)
            preds.append(jnp.argmax(o["logits"], axis=-1))  # on device
            trues.append(batch["label"])
        if not preds:
            raise ValueError(
                f"evaluation split of {len(split)} samples produced no batches"
            )
        y_pred = np.concatenate(jax.device_get(preds))
        y_true = np.concatenate(trues)
    m = metrics.classification_metrics(y_true, y_pred)
    dt = time.time() - start
    print(
        f"Accuracy: {m['accuracy']:.3f}, Precision: {m['precision']:.3f}, "
        f"Recall: {m['recall']:.3f}, F1-score: {m['f1']:.3f}, Inference Time: {dt:.3f}"
    )
    return m["accuracy"], m["precision"], m["recall"], m["f1"], dt


def validation_metrics(
    eval_step: Callable,
    params,
    dm: DataModule,
    split: Split,
    temperature=None,
    batch_stats=None,
) -> Dict[str, float]:
    """Per-epoch validation pass: accuracy + mean per-batch val losses.

    Tag parity with the reference's ``validation_step`` logging: every model
    family logs ``val/cls_loss`` + ``val/accuracy`` (e.g.
    ``/root/reference/models/swin.py:52-53``), and vit_som additionally logs
    ``val/som_loss`` / ``val/total_loss`` (``models/vit_som.py:119``).
    Losses stay on device; ONE device_get at the end (each host pull costs a
    tunnel round-trip)."""
    if _multihost():
        from jax.experimental import multihost_utils

        t = temperature if temperature is not None else jnp.asarray(1.0)
        x, y = _local_eval_span(dm, split, False)
        lp = _to_process_local(params)
        lbs = _to_process_local(batch_stats)
        lt = _to_process_local(t)
        bs = dm.cfg.batch_size
        # trim each local span to whole batches, mirroring the single-host
        # n_keep below — an untrimmed ragged tail is PADDED by the scan
        # (repeat of row 0, label 0) and its per-batch loss mean would bias
        # the equal-weight average the processes gather (ADVICE r3)
        n_keep = (len(y) // bs) * bs or len(y)
        x, y = x[:n_keep], y[:n_keep]
        images, labels = jnp.asarray(x), jnp.asarray(y.astype(np.int32))
        res = _batched_device_eval(
            eval_step, lp, images, labels, bs, lt,
            keys=("logits", "cls_loss", "som_loss", "recon_loss", "total_loss"),
            batch_stats=lbs,
        )
        y_pred_local = np.argmax(res["logits"], axis=-1)
        # per-batch loss means gather alongside predictions so multi-host
        # runs emit the same val/* tags as single-host (spans are equal-
        # sized, so the mean of per-process means is the global mean)
        local_losses = {
            # 1-element arrays: tiled allgather concatenates along axis 0
            k: np.asarray([np.mean(v)], dtype=np.float32)
            for k, v in res.items()
            if k.endswith("_loss")
        }
        g = multihost_utils.process_allgather(
            {"pred": y_pred_local, "true": np.asarray(y), **local_losses},
            tiled=True,
        )
        out = {
            "val/accuracy": float(
                np.mean(np.asarray(g["pred"]) == np.asarray(g["true"]))
            )
        }
        for k in local_losses:
            out[f"val/{k}"] = float(np.mean(np.asarray(g[k])))
        return out
    t = temperature if temperature is not None else jnp.asarray(1.0)
    drop_last = len(split) >= dm.cfg.batch_size
    if isinstance(split.x, np.ndarray) and split.x.dtype != object:
        # uniform source: ONE scanned program per epoch instead of a
        # per-batch dispatch loop (a CIFAR-sized val split is ~78 batches =
        # ~78 tunnel RTTs every epoch; the scan is one dispatch + one pull).
        # Arrays are transformed/uploaded once and cached on the split.
        bs = dm.cfg.batch_size
        n_keep = (len(split) // bs) * bs if drop_last else len(split)
        images, labels = dm.device_arrays(split, train_mode=False)
        res = _batched_device_eval(
            eval_step, params, images[:n_keep], labels[:n_keep], bs, t,
            keys=("logits", "cls_loss", "som_loss", "recon_loss", "total_loss"),
            batch_stats=batch_stats,
        )
        y_pred = np.argmax(res["logits"], axis=-1)
        y_true = np.asarray(labels[:n_keep])
        out = {"val/accuracy": float(np.mean(y_pred == y_true))}
        for k, v in res.items():
            if k.endswith("_loss"):
                out[f"val/{k}"] = float(np.mean(v))
        return out
    preds, trues, losses = [], [], []
    for batch in dm.eval_batches(split, drop_last=drop_last):
        o = eval_step(params, jax.device_put(batch), t, batch_stats)
        preds.append(jnp.argmax(o["logits"], axis=-1))
        trues.append(batch["label"])
        losses.append({k: v for k, v in o.items() if k.endswith("_loss")})
    host = jax.device_get({"preds": preds, "losses": losses})
    y_pred = np.concatenate(host["preds"])
    y_true = np.concatenate(trues)
    out = {"val/accuracy": float(np.mean(y_pred == y_true))}
    if host["losses"] and host["losses"][0]:
        for k in host["losses"][0]:
            out[f"val/{k}"] = float(np.mean([l[k] for l in host["losses"]]))
    return out


def evaluate_kmeans(
    latent_fn: Callable,
    params,
    dm: DataModule,
    n_clusters: Optional[int] = None,
    temperature=None,
    batch_stats=None,
) -> Tuple[float, float, float]:
    """k-means on latent embeddings (reference :54-91)."""
    if _multihost():
        from jax.experimental import multihost_utils

        from sklearn.cluster import KMeans

        from vitsom_tpu.eval import metrics

        t = temperature if temperature is not None else jnp.asarray(1.0)
        # span_dt is the timed (post-warm) forward + allgather; the timer
        # here covers only the host-side KMeans fit — starting it before
        # _multihost_span_eval double-counts the forward (the span eval runs
        # once to warm, once timed)
        outs, y_true, span_dt = _multihost_span_eval(
            latent_fn, params, dm, dm.train, True, t, batch_stats,
            keys=("latent",),
        )
        start = time.time()
        x = outs["latent"].reshape(len(y_true), -1)
        k = n_clusters or len(np.unique(y_true))
        km = KMeans(n_clusters=k, random_state=0, n_init=10)
        y_pred = km.fit_predict(x)
        p = metrics.purity(y_true, y_pred)
        n = metrics.nmi(y_true, y_pred)
        dt = span_dt + (time.time() - start)
        print(
            f"Purity (KMeans): {p:.3f}, NMI (KMeans): {n:.3f}, "
            f"Inference Time: {dt:.3f}"
        )
        return p, n, dt
    from sklearn.cluster import KMeans

    from vitsom_tpu.eval import metrics

    t = temperature if temperature is not None else jnp.asarray(1.0)
    feats, trues = [], []
    split = dm.train
    if dm.is_static:
        # warm the latent scan (upload + compile + first-execution penalty)
        # BEFORE the timer, matching the multihost branch and the other
        # evaluators — otherwise the two paths report non-comparable
        # inference times (ADVICE r3)
        images, labels = dm.device_arrays(split, train_mode=True)
        bs = dm.cfg.batch_size
        n_keep = ((len(split) // bs) * bs) or len(split)
        _batched_device_eval(
            latent_fn, params, images[:n_keep], labels[:n_keep], bs, t,
            keys=("latent",), batch_stats=batch_stats,
        )
        start = time.time()
        res = _batched_device_eval(
            latent_fn, params, images[:n_keep], labels[:n_keep], bs, t,
            keys=("latent",), batch_stats=batch_stats,
        )
        x = res["latent"].reshape(n_keep, -1)
        y_true = np.asarray(labels[:n_keep])
    else:
        start = time.time()
        for batch in dm.eval_batches(split):
            o = latent_fn(params, jax.device_put(batch), t, batch_stats)
            feats.append(np.asarray(o["latent"]))
            trues.append(batch["label"])
        x = np.concatenate(feats).reshape(len(np.concatenate(trues)), -1)
        y_true = np.concatenate(trues)

    k = n_clusters or len(np.unique(y_true))
    km = KMeans(n_clusters=k, random_state=0, n_init=10)
    y_pred = km.fit_predict(x)
    p = metrics.purity(y_true, y_pred)
    n = metrics.nmi(y_true, y_pred)
    dt = time.time() - start
    print(f"Purity (KMeans): {p:.3f}, NMI (KMeans): {n:.3f}, Inference Time: {dt:.3f}")
    return p, n, dt
