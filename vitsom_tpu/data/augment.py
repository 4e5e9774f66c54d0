"""Image augmentations in numpy/PIL (no torchvision/timm).

Re-implements the effective transform stack of the reference
(``/root/reference/data/data.py:254-315``):

- grayscale clustering sets (mnist/fmnist/usps): scale-to-[0,1] only
  (reference :270-273)
- RGB train: TF/BYOL-style RandomResizedCrop (no-retry sampling, reference
  ``tools/utils.py:86-113``) + RandAugment + horizontal flip, then the timm
  ``create_transform`` stack appended on top (RRC + flip + rand-m9-mstd0.5-inc1
  + normalize + random erasing) — the reference's double-augmentation quirk
  (``data/data.py:299-304``), replicated as two chained crop/aug passes
- eval: resize (bicubic, crop_pct 0.875 for <=224) + center crop + normalize
  (reference :306-313)

All ops take/return HWC uint8 (PIL interop) until the final scale+normalize.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

from vitsom_tpu.config import AugmentConfig, DataConfig

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CIFAR_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR_STD = (0.2023, 0.1994, 0.2010)


def norm_stats(dataset: str, num_channels: int) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    """Normalization stats per dataset (reference ``data/data.py:275-285``)."""
    if num_channels == 1:
        return (0.5,), (0.5,)
    if dataset in ("cifar-10", "cifar-100"):
        return CIFAR_MEAN, CIFAR_STD
    if dataset == "medmnist":
        return (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
    return IMAGENET_MEAN, IMAGENET_STD


# ---------------------------------------------------------------------------
# geometric ops
# ---------------------------------------------------------------------------


def tf_random_resized_crop(
    img: Image.Image,
    rng: np.random.Generator,
    out_size: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
) -> Image.Image:
    """BYOL/TF-style RRC: single draw, clamp w/h to bounds — no retry loop
    (reference ``tools/utils.py:93-113``)."""
    width, height = img.size
    area = height * width
    target_area = area * rng.uniform(scale[0], scale[1])
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    aspect = math.exp(rng.uniform(*log_ratio))
    w = int(round(math.sqrt(target_area * aspect)))
    h = int(round(math.sqrt(target_area / aspect)))
    w = min(w, width)
    h = min(h, height)
    i = int(rng.integers(0, height - h + 1))
    j = int(rng.integers(0, width - w + 1))
    return img.resize((out_size, out_size), Image.BICUBIC, box=(j, i, j + w, i + h))


def torch_random_resized_crop(
    img: Image.Image,
    rng: np.random.Generator,
    out_size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Image.Image:
    """torchvision-semantics RRC (10-attempt rejection sampling + center-crop
    fallback) — the crop INSIDE timm's ``create_transform`` stack uses these
    semantics and defaults, not the TF/BYOL no-retry crop (reference appends
    ``create_transform(is_training=True)``, ``data/data.py:288-298``)."""
    width, height = img.size
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(*log_ratio))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            i = int(rng.integers(0, height - h + 1))
            j = int(rng.integers(0, width - w + 1))
            return img.resize(
                (out_size, out_size), Image.BICUBIC, box=(j, i, j + w, i + h)
            )
    # fallback: center crop clamped to the ratio bounds
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w, h = width, int(round(width / ratio[0]))
    elif in_ratio > ratio[1]:
        h, w = height, int(round(height * ratio[1]))
    else:
        w, h = width, height
    i = (height - h) // 2
    j = (width - w) // 2
    return img.resize((out_size, out_size), Image.BICUBIC, box=(j, i, j + w, i + h))


def center_crop_resize(img: Image.Image, out_size: int, crop_pct: float) -> Image.Image:
    """Resize shorter side to out_size/crop_pct then center-crop
    (reference ``data/data.py:306-311``)."""
    size = int(out_size / crop_pct)
    w, h = img.size
    if w <= h:
        nw, nh = size, max(1, int(round(h * size / w)))
    else:
        nh, nw = size, max(1, int(round(w * size / h)))
    img = img.resize((nw, nh), Image.BICUBIC)
    left = (nw - out_size) // 2
    top = (nh - out_size) // 2
    return img.crop((left, top, left + out_size, top + out_size))


# ---------------------------------------------------------------------------
# RandAugment (14-op table; torchvision-style and timm-inc1-style magnitudes)
# ---------------------------------------------------------------------------


def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0), Image.BICUBIC)


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0), Image.BICUBIC)


def _translate_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, v * img.size[0], 0, 1, 0), Image.BICUBIC)


def _translate_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v * img.size[1]), Image.BICUBIC)


_OPS = {
    # name: (fn(img, v), max_magnitude, signed)
    "Identity": (lambda img, v: img, 0.0, False),
    "AutoContrast": (lambda img, v: ImageOps.autocontrast(img), 0.0, False),
    "Equalize": (lambda img, v: ImageOps.equalize(img), 0.0, False),
    "Rotate": (lambda img, v: img.rotate(v, Image.BICUBIC), 30.0, True),
    "Posterize": (lambda img, v: ImageOps.posterize(img, max(1, int(v))), 4.0, False),
    "Solarize": (lambda img, v: ImageOps.solarize(img, int(v)), 255.0, False),
    "Color": (lambda img, v: ImageEnhance.Color(img).enhance(1.0 + v), 0.9, True),
    "Contrast": (lambda img, v: ImageEnhance.Contrast(img).enhance(1.0 + v), 0.9, True),
    "Brightness": (lambda img, v: ImageEnhance.Brightness(img).enhance(1.0 + v), 0.9, True),
    "Sharpness": (lambda img, v: ImageEnhance.Sharpness(img).enhance(1.0 + v), 0.9, True),
    "ShearX": (_shear_x, 0.3, True),
    "ShearY": (_shear_y, 0.3, True),
    "TranslateX": (_translate_x, 0.45, True),
    "TranslateY": (_translate_y, 0.45, True),
}
_OP_NAMES = list(_OPS)


def rand_augment(
    img: Image.Image,
    rng: np.random.Generator,
    num_ops: int = 2,
    magnitude: int = 9,
    mstd: float = 0.0,
    num_bins: int = 31,
) -> Image.Image:
    """RandAugment: ``num_ops`` random ops at shared magnitude.

    mstd > 0 adds Gaussian jitter to the magnitude per op (timm's mstd0.5);
    num_bins=31 matches torchvision's default bin count, magnitudes are
    normalized to [0, 1] * max per op either way.
    """
    for _ in range(num_ops):
        name = _OP_NAMES[int(rng.integers(0, len(_OP_NAMES)))]
        fn, maxv, signed = _OPS[name]
        m = float(magnitude)
        if mstd > 0:
            m = float(np.clip(rng.normal(m, mstd), 0, num_bins - 1))
        frac = m / (num_bins - 1)
        if name == "Posterize":
            v = 8 - frac * _OPS[name][1]  # bits kept: 8 -> 4
        elif name == "Solarize":
            v = 255 - frac * 255.0  # threshold: 255 -> 0
        else:
            v = frac * maxv
        if signed and rng.random() < 0.5:
            v = -v
        img = fn(img, v)
    return img


# ---------------------------------------------------------------------------
# timm RandAugment: exact `rand-m9-mstd0.5-inc1` semantics
# ---------------------------------------------------------------------------
#
# The reference's effective train transform appends timm's
# ``create_transform(auto_augment='rand-m9-mstd0.5-inc1')`` stack
# (``/root/reference/data/data.py:288-304``). timm's policy differs from
# torchvision RandAugment in every dimension that matters for recipe parity:
#   - op set: the 15 _RAND_INCREASING_TRANSFORMS (adds Invert + SolarizeAdd,
#     drops Identity)
#   - INCREASING magnitude semantics: Posterize/Solarize/Color/Contrast/
#     Brightness/Sharpness get MORE destructive as m grows (torchvision's
#     Posterize/Solarize grow less destructive)
#   - each sampled op applies with probability 0.5 (torchvision always applies)
#   - magnitude jitter: m ~ N(9, mstd=0.5), clamped to [0, 10]; level scale
#     is m/10 (torchvision uses bins/31)
#   - geometric ops fill with the dataset mean color (timm passes
#     img_mean=round(255*mean) as fillcolor)


def _timm_enhance_factor(m: float, rng) -> float:
    v = (m / 10.0) * 0.9
    return 1.0 + (-v if rng.random() < 0.5 else v)


def _timm_ops(fill):
    """name -> fn(img, m, rng). Level formulas follow timm
    ``auto_augment.py`` level_to_arg fns with _MAX_LEVEL=10."""

    def signed(v, rng):
        return -v if rng.random() < 0.5 else v

    def solarize_add(img, add, thresh=128):
        lut = [min(255, i + add) if i < thresh else i for i in range(256)]
        if img.mode == "RGB":
            lut = lut + lut + lut
        return img.point(lut)

    f = fill if len(fill) > 1 else fill[0]
    return {
        "AutoContrast": lambda img, m, rng: ImageOps.autocontrast(img),
        "Equalize": lambda img, m, rng: ImageOps.equalize(img),
        "Invert": lambda img, m, rng: ImageOps.invert(img),
        "Rotate": lambda img, m, rng: img.rotate(
            signed((m / 10.0) * 30.0, rng), Image.BICUBIC, fillcolor=f
        ),
        "PosterizeIncreasing": lambda img, m, rng: ImageOps.posterize(
            img, 4 - int((m / 10.0) * 4)
        ),
        "SolarizeIncreasing": lambda img, m, rng: ImageOps.solarize(
            img, 256 - int((m / 10.0) * 256)
        ),
        "SolarizeAdd": lambda img, m, rng: solarize_add(img, int((m / 10.0) * 110)),
        "ColorIncreasing": lambda img, m, rng: ImageEnhance.Color(img).enhance(
            _timm_enhance_factor(m, rng)
        ),
        "ContrastIncreasing": lambda img, m, rng: ImageEnhance.Contrast(img).enhance(
            _timm_enhance_factor(m, rng)
        ),
        "BrightnessIncreasing": lambda img, m, rng: ImageEnhance.Brightness(
            img
        ).enhance(_timm_enhance_factor(m, rng)),
        "SharpnessIncreasing": lambda img, m, rng: ImageEnhance.Sharpness(
            img
        ).enhance(_timm_enhance_factor(m, rng)),
        "ShearX": lambda img, m, rng: img.transform(
            img.size, Image.AFFINE,
            (1, signed((m / 10.0) * 0.3, rng), 0, 0, 1, 0),
            Image.BICUBIC, fillcolor=f,
        ),
        "ShearY": lambda img, m, rng: img.transform(
            img.size, Image.AFFINE,
            (1, 0, 0, signed((m / 10.0) * 0.3, rng), 1, 0),
            Image.BICUBIC, fillcolor=f,
        ),
        "TranslateXRel": lambda img, m, rng: img.transform(
            img.size, Image.AFFINE,
            (1, 0, signed((m / 10.0) * 0.45, rng) * img.size[0], 0, 1, 0),
            Image.BICUBIC, fillcolor=f,
        ),
        "TranslateYRel": lambda img, m, rng: img.transform(
            img.size, Image.AFFINE,
            (1, 0, 0, 0, 1, signed((m / 10.0) * 0.45, rng) * img.size[1]),
            Image.BICUBIC, fillcolor=f,
        ),
    }


TIMM_RAND_INCREASING_OPS = tuple(_timm_ops((128, 128, 128)))


def timm_rand_augment(
    img: Image.Image,
    rng: np.random.Generator,
    num_layers: int = 2,
    magnitude: float = 9.0,
    mstd: float = 0.5,
    prob: float = 0.5,
    fill: Tuple[int, ...] = (124, 116, 104),
) -> Image.Image:
    """timm ``rand-m9-mstd0.5-inc1``: sample ``num_layers`` ops uniformly
    WITH replacement; each applies with probability ``prob``; magnitude is
    gaussian-jittered per op and clamped to [0, 10]."""
    ops = _timm_ops(tuple(int(c) for c in fill))
    names = list(ops)
    for _ in range(num_layers):
        name = names[int(rng.integers(0, len(names)))]
        if prob < 1.0 and rng.random() > prob:
            continue
        m = float(magnitude)
        if mstd > 0:
            m = float(np.clip(rng.normal(m, mstd), 0.0, 10.0))
        img = ops[name](img, m, rng)
    return img


def random_erasing(
    x: np.ndarray,
    rng: np.random.Generator,
    prob: float,
    mode: str = "pixel",
    count: int = 1,
    scale: Tuple[float, float] = (0.02, 1 / 3),
    ratio: Tuple[float, float] = (0.3, 3.3),
) -> np.ndarray:
    """timm-style RandomErasing on a normalized float HWC array
    ('pixel' mode fills with N(0,1) noise)."""
    if prob <= 0 or rng.random() > prob:
        return x
    h, w, c = x.shape
    area = h * w
    for _ in range(max(1, count)):
        for _attempt in range(10):
            target = area * rng.uniform(*scale)
            aspect = math.exp(rng.uniform(math.log(ratio[0]), math.log(ratio[1])))
            eh = int(round(math.sqrt(target * aspect)))
            ew = int(round(math.sqrt(target / aspect)))
            if eh < h and ew < w:
                top = int(rng.integers(0, h - eh + 1))
                left = int(rng.integers(0, w - ew + 1))
                if mode == "pixel":
                    x[top : top + eh, left : left + ew] = rng.normal(
                        size=(eh, ew, c)
                    ).astype(x.dtype)
                else:
                    x[top : top + eh, left : left + ew] = 0.0
                break
    return x


# ---------------------------------------------------------------------------
# transform factories
# ---------------------------------------------------------------------------


def _to_pil(x: np.ndarray) -> Image.Image:
    if x.dtype != np.uint8:
        x = np.clip(x * 255.0 if x.max() <= 1.0 else x, 0, 255).astype(np.uint8)
    if x.ndim == 3 and x.shape[2] == 1:
        return Image.fromarray(x[:, :, 0], mode="L")
    return Image.fromarray(x)


def _from_pil(img: Image.Image, num_channels: int) -> np.ndarray:
    x = np.asarray(img, dtype=np.float32) / 255.0
    if x.ndim == 2:
        x = x[:, :, None]
    if x.shape[2] != num_channels:
        if num_channels == 1:
            x = x.mean(axis=2, keepdims=True)
        else:
            x = np.repeat(x[:, :, :1], num_channels, axis=2)
    return x


def is_static_transform(data_cfg: DataConfig) -> bool:
    """True when the train transform is deterministic (no random augs), so
    the dataset can be pre-transformed once and live on device."""
    if data_cfg.dataset in ("mnist", "fmnist", "usps", "reuters-10k"):
        return True
    a = data_cfg.augment
    return (
        a.randaug_n == 0
        and tuple(a.resize_scale) == (1.0, 1.0)
        and tuple(a.resize_ratio) == (1.0, 1.0)
        and a.reprob == 0
        and a.horizontal_flip == 0
        and not a.autoaugment
    )


def make_train_transform(data_cfg: DataConfig) -> Callable:
    """Per-image train transform: HWC array (+ RNG) -> float32 HWC."""
    aug = data_cfg.augment
    name = data_cfg.dataset
    size = data_cfg.input_size

    if name in ("mnist", "fmnist", "usps"):
        # ToTensor only (reference ``data/data.py:270-273``)
        def transform(x, rng):
            if x.dtype == np.uint8:
                return x.astype(np.float32) / 255.0
            return x.astype(np.float32)

        return transform

    if is_static_transform(data_cfg):
        # no random augs configured: deterministic resize/normalize only
        return make_eval_transform(data_cfg)

    mean, std = norm_stats(name, data_cfg.num_channels)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    # timm fills geometric-op borders with the dataset mean color
    # (transforms_factory.py: img_mean=tuple(min(255, round(255*x))))
    timm_fill = tuple(min(255, round(255 * float(m))) for m in mean)

    def transform(x, rng):
        img = _to_pil(x)
        # pass 1: custom TF-style RRC + torchvision RandAugment + flip
        # (reference ``data/data.py:299-303``, config-driven parameters)
        img = tf_random_resized_crop(img, rng, size, tuple(aug.resize_scale), tuple(aug.resize_ratio))
        if aug.randaug_n > 0:
            img = rand_augment(img, rng, num_ops=aug.randaug_n, magnitude=aug.randaug_m)
        if aug.horizontal_flip > 0 and rng.random() < aug.horizontal_flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        # pass 2: the appended timm create_transform(is_training=True) stack
        # (reference :288-298) with TIMM'S OWN defaults — torch-semantics RRC
        # at scale (0.08, 1.0) / ratio (3/4, 4/3), flip p=0.5, then
        # rand-m9-mstd0.5-inc1 — NOT the config's pass-1 parameters
        img = torch_random_resized_crop(img, rng, size)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if aug.autoaugment:
            img = timm_rand_augment(img, rng, fill=timm_fill)
        arr = _from_pil(img, data_cfg.num_channels)
        arr = (arr - mean_a) / std_a
        arr = random_erasing(arr, rng, aug.reprob, aug.remode, aug.recount)
        return arr

    return transform


def make_eval_transform(data_cfg: DataConfig) -> Callable:
    name = data_cfg.dataset
    size = data_cfg.input_size

    if name in ("mnist", "fmnist", "usps"):
        def transform(x, rng=None):
            if x.dtype == np.uint8:
                return x.astype(np.float32) / 255.0
            return x.astype(np.float32)

        return transform

    mean, std = norm_stats(name, data_cfg.num_channels)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    crop_pct = 0.875 if size <= 224 else 1.0  # reference :307

    def transform(x, rng=None):
        img = _to_pil(x)
        img = center_crop_resize(img, size, crop_pct)
        arr = _from_pil(img, data_cfg.num_channels)
        return (arr - mean_a) / std_a

    return transform
