"""First-party dataset loaders (raw file formats, no torchvision/timm).

Replaces the reference's torchvision/medmnist/h5py dataset zoo
(``/root/reference/data/data.py:317-394``) with direct readers for the raw
on-disk formats, returning numpy arrays (NHWC uint8/float32 + int labels):

- mnist / fmnist : IDX (optionally gzipped) files
- usps           : ``usps.h5`` (h5py)                    (reference :196-231)
- cifar-10/100   : python pickle batches
- svhn           : ``{train,test}_32x32.mat`` (scipy)
- medmnist       : ``pathmnist.npz``
- reuters-10k    : ``reutersidf10k.npy``                 (reference :233-252)
- flowers-17     : flat jpg dir, 80 images/class         (reference :170-194)
- flowers-102    : jpg dir + ``imagelabels.mat``/``setid.mat``
- tiny-imagenet  : ``tiny-imagenet-200/`` ImageFolder layout (reference :42-134)
- synthetic      : deterministic class-conditional blobs for smoke/bench runs

All loaders search ``<data_dir>`` for common layouts. Zero-egress: nothing
downloads; a missing dataset raises unless ``allow_synthetic`` is set.
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
import tarfile
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from vitsom_tpu.config import DataConfig


@dataclass
class ArraySplits:
    """Raw arrays straight off disk; images NHWC."""

    train_x: np.ndarray
    train_y: np.ndarray
    test_x: np.ndarray
    test_y: np.ndarray


def _find(data_dir: str, candidates: List[str]) -> Optional[str]:
    for c in candidates:
        p = os.path.join(data_dir, c)
        if os.path.exists(p):
            return p
    return None


def _open_maybe_gz(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


# ---------------------------------------------------------------------------
# IDX (MNIST family)
# ---------------------------------------------------------------------------


def _read_idx(path: str) -> np.ndarray:
    with _open_maybe_gz(path) as f:
        magic = struct.unpack(">I", f.read(4))[0]
        dtype_code = (magic >> 8) & 0xFF
        ndim = magic & 0xFF
        dims = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        dtype = {0x08: np.uint8, 0x09: np.int8, 0x0B: np.int16, 0x0C: np.int32,
                 0x0D: np.float32, 0x0E: np.float64}[dtype_code]
        data = np.frombuffer(f.read(), dtype=dtype.newbyteorder(">"))
        return data.reshape(dims).astype(dtype)


def _load_idx_pair(data_dir: str, stem: str) -> Tuple[np.ndarray, np.ndarray]:
    img = _find(data_dir, [f"{stem}-images-idx3-ubyte", f"{stem}-images-idx3-ubyte.gz",
                           f"{stem}-images.idx3-ubyte"])
    lbl = _find(data_dir, [f"{stem}-labels-idx1-ubyte", f"{stem}-labels-idx1-ubyte.gz",
                           f"{stem}-labels.idx1-ubyte"])
    if img is None or lbl is None:
        raise FileNotFoundError(f"IDX files for {stem} not found in {data_dir}")
    x = _read_idx(img)[..., None]  # [N, 28, 28, 1]
    y = _read_idx(lbl).astype(np.int64)
    return x, y


def load_mnist_like(data_dir: str, name: str) -> ArraySplits:
    sub = {"mnist": ["MNIST/raw", "mnist", "."],
           "fmnist": ["FashionMNIST/raw", "fmnist", "fashion-mnist", "."]}[name]
    for s in sub:
        d = os.path.join(data_dir, s)
        if os.path.isdir(d):
            try:
                tx, ty = _load_idx_pair(d, "train")
                vx, vy = _load_idx_pair(d, "t10k")
                return ArraySplits(tx, ty, vx, vy)
            except FileNotFoundError:
                continue
    raise FileNotFoundError(f"{name} IDX files not found under {data_dir}")


# ---------------------------------------------------------------------------
# USPS (h5), Reuters (npy), PathMNIST (npz)
# ---------------------------------------------------------------------------


def load_usps(data_dir: str) -> ArraySplits:
    import h5py

    path = _find(data_dir, ["usps.h5"])
    if path is None:
        raise FileNotFoundError(f"usps.h5 not found in {data_dir}")
    with h5py.File(path, "r") as hf:
        tx = hf["train"]["data"][:].reshape(-1, 16, 16, 1).astype(np.float32)
        ty = hf["train"]["target"][:].astype(np.int64)
        vx = hf["test"]["data"][:].reshape(-1, 16, 16, 1).astype(np.float32)
        vy = hf["test"]["target"][:].astype(np.int64)
    # reference feeds raw h5 floats (already [0,1]) with no transform
    # (``data/data.py:210-213``)
    return ArraySplits(tx, ty, vx, vy)


def load_reuters(data_dir: str) -> ArraySplits:
    path = _find(data_dir, ["reutersidf10k.npy"])
    if path is None:
        raise FileNotFoundError(f"reutersidf10k.npy not found in {data_dir}")
    d = np.load(path, allow_pickle=True).item()
    x = np.asarray(d["data"], dtype=np.float32)
    y = np.asarray(d["label"], dtype=np.int64).reshape(-1)
    # no train/test split on disk; reference treats it as one TensorDataset
    n = int(0.8 * len(x))
    return ArraySplits(x[:n], y[:n], x[n:], y[n:])


def load_pathmnist(data_dir: str) -> ArraySplits:
    path = _find(data_dir, ["pathmnist.npz", "medmnist/pathmnist.npz"])
    if path is None:
        raise FileNotFoundError(f"pathmnist.npz not found in {data_dir}")
    z = np.load(path)
    return ArraySplits(
        z["train_images"], z["train_labels"].reshape(-1).astype(np.int64),
        z["test_images"], z["test_labels"].reshape(-1).astype(np.int64),
    )


# ---------------------------------------------------------------------------
# CIFAR (pickle)
# ---------------------------------------------------------------------------


def _cifar_batch(path: str, labels_key: bytes) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)  # NHWC
    y = np.asarray(d[labels_key], dtype=np.int64)
    return x, y


def load_cifar10(data_dir: str) -> ArraySplits:
    root = _find(data_dir, ["cifar-10-batches-py"])
    if root is None:
        raise FileNotFoundError(f"cifar-10-batches-py not found in {data_dir}")
    xs, ys = [], []
    for i in range(1, 6):
        x, y = _cifar_batch(os.path.join(root, f"data_batch_{i}"), b"labels")
        xs.append(x)
        ys.append(y)
    tx, ty = np.concatenate(xs), np.concatenate(ys)
    vx, vy = _cifar_batch(os.path.join(root, "test_batch"), b"labels")
    return ArraySplits(tx, ty, vx, vy)


def load_cifar100(data_dir: str) -> ArraySplits:
    root = _find(data_dir, ["cifar-100-python"])
    if root is None:
        raise FileNotFoundError(f"cifar-100-python not found in {data_dir}")
    tx, ty = _cifar_batch(os.path.join(root, "train"), b"fine_labels")
    vx, vy = _cifar_batch(os.path.join(root, "test"), b"fine_labels")
    return ArraySplits(tx, ty, vx, vy)


# ---------------------------------------------------------------------------
# SVHN (.mat)
# ---------------------------------------------------------------------------


def load_svhn(data_dir: str) -> ArraySplits:
    from scipy.io import loadmat

    tr = _find(data_dir, ["train_32x32.mat", "svhn/train_32x32.mat"])
    te = _find(data_dir, ["test_32x32.mat", "svhn/test_32x32.mat"])
    if tr is None or te is None:
        raise FileNotFoundError(f"SVHN .mat files not found in {data_dir}")

    def _load(p):
        m = loadmat(p)
        x = m["X"].transpose(3, 0, 1, 2)  # HWCN -> NHWC
        y = m["y"].reshape(-1).astype(np.int64)
        y[y == 10] = 0  # torchvision convention: label 10 -> 0
        return x, y

    tx, ty = _load(tr)
    vx, vy = _load(te)
    return ArraySplits(tx, ty, vx, vy)


# ---------------------------------------------------------------------------
# Image folders (flowers, tiny-imagenet)
# ---------------------------------------------------------------------------


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def load_flowers17(data_dir: str) -> ArraySplits:
    """Flat jpg dir ``jpg/``: class = index // 80, matching the reference's
    ``organize_flowers`` mapping (``data/data.py:170-194``). Images are kept
    as variable-size paths and decoded lazily by the pipeline; here we eagerly
    decode since the set is small (1360 images)."""
    root = _find(data_dir, ["jpg", "17flowers/jpg"])
    if root is None:
        tar = _find(data_dir, ["17flowers.tgz"])
        if tar is not None:
            with tarfile.open(tar, "r:gz") as t:
                t.extractall(path=data_dir)
            root = os.path.join(data_dir, "jpg")
        else:
            raise FileNotFoundError(f"flowers-17 jpg dir not found in {data_dir}")
    # images may already be organized into class dirs
    entries = sorted(os.listdir(root))
    jpgs = [e for e in entries if e.endswith(".jpg")]
    imgs, labels = [], []
    if jpgs:
        for i, name in enumerate(sorted(jpgs)):
            imgs.append(_load_image(os.path.join(root, name)))
            labels.append(i // 80)
    else:
        classes = sorted(d for d in entries if os.path.isdir(os.path.join(root, d)))
        for ci, cname in enumerate(classes):
            for f in sorted(os.listdir(os.path.join(root, cname))):
                if f.endswith(".jpg"):
                    imgs.append(_load_image(os.path.join(root, cname, f)))
                    labels.append(ci)
    y = np.asarray(labels, dtype=np.int64)
    x = np.asarray(imgs, dtype=object)
    # reference uses the SAME full dataset for train and test with different
    # transforms (``data/data.py:154-168``) — replicate
    return ArraySplits(x, y, x, y)


def load_flowers102(data_dir: str) -> ArraySplits:
    from scipy.io import loadmat

    root = _find(data_dir, ["flowers-102", "102flowers", "."])
    jpg = _find(root, ["jpg"]) if root else None
    lab = _find(root, ["imagelabels.mat"]) if root else None
    sid = _find(root, ["setid.mat"]) if root else None
    if not (jpg and lab and sid):
        raise FileNotFoundError(f"flowers-102 files not found in {data_dir}")
    labels = loadmat(lab)["labels"].reshape(-1).astype(np.int64) - 1
    setid = loadmat(sid)
    trn = setid["trnid"].reshape(-1)
    tst = setid["tstid"].reshape(-1)

    def gather(ids):
        xs = [ _load_image(os.path.join(jpg, f"image_{i:05d}.jpg")) for i in ids ]
        return np.asarray(xs, dtype=object), labels[ids - 1]

    tx, ty = gather(trn)
    vx, vy = gather(tst)
    return ArraySplits(tx, ty, vx, vy)


def load_tiny_imagenet(data_dir: str) -> ArraySplits:
    root = _find(data_dir, ["tiny-imagenet-200"])
    if root is None:
        raise FileNotFoundError(f"tiny-imagenet-200 not found in {data_dir}")
    train_dir = os.path.join(root, "train")
    classes = sorted(d for d in os.listdir(train_dir) if os.path.isdir(os.path.join(train_dir, d)))
    cls_to_idx = {c: i for i, c in enumerate(classes)}
    tx, ty = [], []
    for c in classes:
        cdir = os.path.join(train_dir, c)
        img_dir = os.path.join(cdir, "images")
        src = img_dir if os.path.isdir(img_dir) else cdir
        for f in sorted(os.listdir(src)):
            if f.lower().endswith((".jpeg", ".jpg", ".png")):
                tx.append(os.path.join(src, f))
                ty.append(cls_to_idx[c])
    # val set with annotations file (reference ``data/data.py:64-91``)
    val_dir = os.path.join(root, "val")
    ann = os.path.join(val_dir, "val_annotations.txt")
    vx, vy = [], []
    if os.path.exists(ann):
        with open(ann) as f:
            for line in f:
                parts = line.strip().split("\t")
                img, cls = parts[0], parts[1]
                p = os.path.join(val_dir, "images", img)
                if not os.path.exists(p):
                    p = os.path.join(val_dir, cls, img)
                vx.append(p)
                vy.append(cls_to_idx[cls])
    else:  # already restructured into class dirs
        for c in sorted(os.listdir(val_dir)):
            cdir = os.path.join(val_dir, c)
            if not os.path.isdir(cdir) or c not in cls_to_idx:
                continue
            for f in sorted(os.listdir(cdir)):
                vx.append(os.path.join(cdir, f))
                vy.append(cls_to_idx[c])
    # paths kept lazy: 100k 64x64 images decode on the fly in the pipeline
    return ArraySplits(
        np.asarray(tx, dtype=object), np.asarray(ty, dtype=np.int64),
        np.asarray(vx, dtype=object), np.asarray(vy, dtype=np.int64),
    )


# ---------------------------------------------------------------------------
# synthetic (smoke tests / benches; deterministic)
# ---------------------------------------------------------------------------


# Stored resolution of each real dataset's source files: the synthetic
# stand-in must be generated at THIS size, not ``data.input_size`` — the
# reference stores e.g. CIFAR-10 at 32x32 and lets the transform stack
# resize to input_size (``/root/reference/data/data.py:254-315``), so a
# config like mobile_vit's input_size=224 over cifar-10 means a 32->224
# RandomResizedCrop per batch, NOT a 224-native dataset. Generating at
# input_size both broke parity and OOM'd the chip (50k x 224^2 x 3 u8 =
# 7.5 GB resident dataset buffer, family_bench_r3/mobile_vit.log).
_NATIVE_HW = {
    "mnist": 28, "fmnist": 28, "usps": 16, "medmnist": 28,
    "cifar-10": 32, "cifar-100": 32, "svhn": 32, "tiny-imagenet": 64,
}


def make_synthetic(cfg: DataConfig, num_classes_hint: int = 10) -> ArraySplits:
    """Deterministic class-conditional blobs shaped like the real dataset.
    Classes are separable so clustering/classification metrics are
    non-trivial in smoke tests.

    Large generations are cached on disk and mmap-loaded on reuse: this
    host has ONE CPU core, and the ~2 GB of elementwise numpy passes for an
    mnist-sized draw cost ~6-7 s per process — which lands directly on every
    benchmarked run_duration. The reference's timed runs read pre-existing
    dataset files from disk (``/root/reference/data/data.py:356-380``), so a
    disk-cached stand-in is the parity-faithful shape, not a shortcut."""
    k = max(cfg.num_classes, num_classes_hint)
    n_train = cfg.synthetic_size
    n_test = max(cfg.synthetic_size // 5, 64)

    cache_path = None
    if n_train >= 8192 and not getattr(cfg, "synthetic_object_array", False):
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".synthetic_cache")
        # _g4: generator version — bump whenever gen() numerics change so
        # stale on-disk caches (older generator streams) are never reused
        # (g3: low-frequency class directions in overlap mode; g4: QR-
        # orthonormalized within the smooth span)
        tag = (
            f"{cfg.dataset}_{_NATIVE_HW.get(cfg.dataset, cfg.input_size)}"
            f"x{cfg.num_channels}"
            f"_k{max(cfg.num_classes, num_classes_hint)}_n{n_train}"
            f"_ov{getattr(cfg, 'synthetic_overlap', 0.0)}"
            f"_{getattr(cfg, 'synthetic_gen', 'g4')}"
        )
        cache_path = os.path.join(cache_dir, tag + ".npz")
        if os.path.exists(cache_path):
            try:
                z = np.load(cache_path)
                return ArraySplits(z["tx"], z["ty"], z["vx"], z["vy"])
            except Exception:
                pass  # corrupt/partial cache: regenerate below
    # zlib.crc32 is stable across processes (Python's str hash is randomized
    # per process, which silently made "deterministic" data differ between a
    # training run and a later checkpoint evaluation)
    import zlib

    rng = np.random.default_rng(zlib.crc32(cfg.dataset.encode()))
    h = w = _NATIVE_HW.get(cfg.dataset, cfg.input_size)
    c = cfg.num_channels

    overlap = getattr(cfg, "synthetic_overlap", 0.0)
    if overlap > 0.0:
        # Overlapping-class mode (tunable Bayes error): class means are
        # mu_i = 0.5 + delta * u_i with u_i ~ random unit images (nearly
        # orthogonal in high dim), per-pixel noise sigma * N(0, 1). Along
        # the (mu_i - mu_j) axis the two classes are 1-D Gaussians at
        # distance delta*sqrt(2) with std sigma, so the pairwise Bayes
        # error is Phi_c(delta*sqrt(2) / (2*sigma)); delta is solved from
        # the requested error. Purity CANNOT reach 1.0 here — the quality
        # protocol's non-saturating regime.
        from scipy.stats import norm as _norm

        sigma = 0.1  # ~25/255 per pixel: far above uint8 quantization noise
        delta = np.sqrt(2.0) * sigma * float(_norm.isf(overlap))
        d = h * w * c
        # LOW-FREQUENCY class directions (g3): coarse 4x4-per-channel noise
        # bilinearly upsampled to [h, w], then unit-normalized. Per-pixel
        # amplitude and the pairwise-Bayes-error calibration are unchanged
        # (unit directions, near-orthogonal), but the signal now survives
        # the classification augmentation stack: RandomResizedCrop's
        # resampling annihilates white-noise directions (every augmented cls
        # calibration at overlaps 0.1/0.02/0.005 scored the 0.097 random
        # floor while the un-augmented clustering task at 0.001 scored
        # purity 0.83), whereas a spatially smooth field passes through
        # bilinear resize nearly losslessly and a partial crop of it stays
        # class-informative.
        if getattr(cfg, "synthetic_gen", "g4") == "g2":
            # (g2) white-noise unit class directions: near-orthogonal in
            # pixel dim, maximally stable for the UN-AUGMENTED clustering
            # quality protocol (the g4 smooth-span task at ov=0.001
            # collapses to near-floor purity on ~half the training seeds —
            # measured, attn_dtype_quality_v2). Annihilated by bilinear
            # resampling, so NOT usable under the cls augmentation stack.
            dirs = rng.normal(size=(k, d)).astype(np.float32)
            dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        else:
            from scipy.ndimage import zoom as _zoom

            coarse = rng.normal(size=(k, 4, 4, c)).astype(np.float32)
            dirs = _zoom(
                coarse, (1, h / 4.0, w / 4.0, 1), order=1
            ).reshape(k, d)
            # (g4) ORTHONORMALIZE within the smooth span: QR on dirs^T
            # yields k exactly-orthonormal linear combinations of the k
            # smooth fields (combinations of smooth fields stay smooth, so
            # augmentation robustness is preserved). Raw upsampled 4x4
            # coarse noise has only 16*c degrees of freedom, so on
            # 1-channel datasets k=10 unit directions overlapped heavily
            # and the pairwise-separation calibration silently broke
            # (measured on-chip: un-augmented clustering purity at ov=0.001
            # fell 0.83 -> 0.11 going white-noise -> raw-smooth dirs). QR
            # restores the exact delta*sqrt(2) pairwise mean separation the
            # Bayes-error solve assumes.
            q_mat, _ = np.linalg.qr(dirs.T.astype(np.float64))
            dirs = np.ascontiguousarray(q_mat.T).astype(np.float32)
        means = 0.5 + delta * dirs.reshape(k, h, w, c)

        def gen(n):
            y = rng.integers(0, k, size=n)
            # f32-native draws + in-place ops: the f64 draw/cast/temporary
            # chain cost ~6 s at n=70000 (measured), which lands directly on
            # the protocol wall-clock
            x = rng.standard_normal(size=(n, h, w, c), dtype=np.float32)
            x *= sigma
            x += means[y]
            np.clip(x, 0, 1, out=x)
            x *= 255
            return x.astype(np.uint8), y.astype(np.int64)

    else:
        # Class templates are drawn ONCE, shared by every gen() call: train
        # and test MUST come from the same class-conditional distribution
        # (a previous version re-drew templates per call, which silently
        # made the test split's classes unrelated to the train split's —
        # classifiers scored ~random test accuracy while val, carved from
        # train, scored 1.0). Guarded by test_synthetic_train_test_consistent.
        templates = rng.random(size=(k, h, w, c), dtype=np.float32)
        templates = templates * (0.6 * 255.0)

        def gen(n):
            y = rng.integers(0, k, size=n)
            # per-class template + noise, in [0, 255]; f32-native draws and
            # in-place mixing (t*0.6 + u*0.4)*255 = t*153 + u*102 — the f64
            # draw/temporary chain cost ~6 s at n=70000 (measured)
            noise = rng.random(size=(n, h, w, c), dtype=np.float32)
            noise *= 0.4 * 255.0
            x = templates[y]
            x += noise
            return x.astype(np.uint8), y.astype(np.int64)

    tx, ty = gen(n_train)
    vx, vy = gen(n_test)
    if getattr(cfg, "synthetic_object_array", False):
        # variable-size object arrays (faithful stand-in for jpg-dir
        # sources): re-render each fixed-size image at a random resolution
        # so the pipeline must take the host-PIL stream path
        def to_object(x):
            from PIL import Image

            out = np.empty(len(x), dtype=object)
            for i, img in enumerate(x):
                hh = int(rng.integers(400, 700))
                ww = int(rng.integers(400, 700))
                arr = img if img.shape[-1] != 1 else np.repeat(img, 3, -1)
                out[i] = np.asarray(
                    Image.fromarray(arr).resize((ww, hh), Image.BILINEAR)
                )
            return out

        return ArraySplits(to_object(tx), ty, to_object(vx), vy)
    if cache_path is not None:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        # tmp name MUST end in .npz: np.savez appends the suffix otherwise
        # and the atomic rename below would target a file that doesn't exist
        tmp = cache_path[: -len(".npz")] + f".tmp{os.getpid()}.npz"
        try:
            # uncompressed savez + atomic rename: compression costs more CPU
            # than the single-core host can afford, and concurrent processes
            # (pytest workers, protocol attempts) must never read a partial
            # file
            np.savez(tmp, tx=tx, ty=ty, vx=vx, vy=vy)
            os.replace(tmp, cache_path)
        except OSError:
            pass  # read-only/parallel-race: caching is best-effort
    return ArraySplits(tx, ty, vx, vy)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_LOADERS = {
    "mnist": lambda d: load_mnist_like(d, "mnist"),
    "fmnist": lambda d: load_mnist_like(d, "fmnist"),
    "usps": load_usps,
    "reuters-10k": load_reuters,
    "medmnist": load_pathmnist,
    "cifar-10": load_cifar10,
    "cifar-100": load_cifar100,
    "svhn": load_svhn,
    "flowers-17": load_flowers17,
    "flowers-102": load_flowers102,
    "tiny-imagenet": load_tiny_imagenet,
}


def load_raw(cfg: DataConfig) -> ArraySplits:
    name = cfg.dataset
    if name == "synthetic":
        return make_synthetic(cfg)
    loader = _LOADERS.get(name)
    if loader is None:
        raise ValueError(f"Dataset {name} is not supported")
    try:
        return loader(cfg.data_dir)
    except FileNotFoundError:
        if cfg.allow_synthetic:
            return make_synthetic(cfg)
        raise
