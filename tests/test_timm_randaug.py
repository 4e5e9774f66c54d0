"""Golden tests for the timm-exact RandAugment (`rand-m9-mstd0.5-inc1`).

timm itself is not in the image, so the oracles are the documented level
formulas of ``timm/data/auto_augment.py`` (_MAX_LEVEL=10, increasing
transforms) evaluated directly through PIL — op set, magnitude curves,
sign handling, per-op apply probability, and jitter clamping.
"""

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

from vitsom_tpu.data.augment import (
    TIMM_RAND_INCREASING_OPS,
    _timm_enhance_factor,
    _timm_ops,
    timm_rand_augment,
)


class StubRng:
    """Deterministic rng: random() fixed (>=0.5 -> positive sign, op applies
    when prob=0.5 ... random() <= prob), normal() returns the mean."""

    def __init__(self, r=0.4):
        self.r = r

    def random(self):
        return self.r

    def integers(self, lo, hi):
        return lo

    def normal(self, mean, std):
        return mean


def gradient_img(mode="RGB", size=16):
    g = np.tile(np.linspace(0, 255, size, dtype=np.uint8), (size, 1))
    if mode == "RGB":
        return Image.fromarray(np.stack([g, g.T, g // 2], axis=-1))
    return Image.fromarray(g, mode="L")


def test_op_set_matches_timm_rand_increasing_transforms():
    assert set(TIMM_RAND_INCREASING_OPS) == {
        "AutoContrast", "Equalize", "Invert", "Rotate",
        "PosterizeIncreasing", "SolarizeIncreasing", "SolarizeAdd",
        "ColorIncreasing", "ContrastIncreasing", "BrightnessIncreasing",
        "SharpnessIncreasing", "ShearX", "ShearY",
        "TranslateXRel", "TranslateYRel",
    }
    assert len(TIMM_RAND_INCREASING_OPS) == 15


def test_posterize_increasing_curve():
    """bits = 4 - int(m/10*4): MORE destructive as m grows (the inc1
    semantics torchvision inverts)."""
    img = gradient_img()
    ops = _timm_ops((0, 0, 0))
    rng = StubRng()
    for m, bits in [(0, 4), (4.9, 3), (9, 1), (10, 0)]:
        got = np.asarray(ops["PosterizeIncreasing"](img, m, rng))
        want = np.asarray(ImageOps.posterize(img, bits))
        np.testing.assert_array_equal(got, want, err_msg=f"m={m}")


def test_solarize_increasing_curve():
    img = gradient_img()
    ops = _timm_ops((0, 0, 0))
    rng = StubRng()
    # m=0 -> threshold 256 (identity); m=10 -> threshold 0 (full invert)
    np.testing.assert_array_equal(
        np.asarray(ops["SolarizeIncreasing"](img, 0, rng)), np.asarray(img)
    )
    np.testing.assert_array_equal(
        np.asarray(ops["SolarizeIncreasing"](img, 10, rng)),
        np.asarray(ImageOps.invert(img)),
    )
    np.testing.assert_array_equal(
        np.asarray(ops["SolarizeIncreasing"](img, 9, rng)),
        np.asarray(ImageOps.solarize(img, 256 - int(0.9 * 256))),
    )


def test_solarize_add_curve():
    img = gradient_img()
    ops = _timm_ops((0, 0, 0))
    got = np.asarray(ops["SolarizeAdd"](img, 10, StubRng()))
    arr = np.asarray(img).astype(np.int32)
    want = np.where(arr < 128, np.minimum(arr + 110, 255), arr).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_rotate_and_shear_magnitudes():
    img = gradient_img()
    fill = (124, 116, 104)
    ops = _timm_ops(fill)
    rng = StubRng(r=0.9)  # positive sign
    np.testing.assert_array_equal(
        np.asarray(ops["Rotate"](img, 10, rng)),
        np.asarray(img.rotate(30.0, Image.BICUBIC, fillcolor=fill)),
    )
    np.testing.assert_array_equal(
        np.asarray(ops["ShearX"](img, 9, rng)),
        np.asarray(
            img.transform(
                img.size, Image.AFFINE, (1, 0.27, 0, 0, 1, 0),
                Image.BICUBIC, fillcolor=fill,
            )
        ),
    )
    # negative sign branch
    rng_neg = StubRng(r=0.4)
    np.testing.assert_array_equal(
        np.asarray(ops["Rotate"](img, 10, rng_neg)),
        np.asarray(img.rotate(-30.0, Image.BICUBIC, fillcolor=fill)),
    )


def test_translate_rel_is_relative_to_size():
    img = gradient_img(size=20)
    ops = _timm_ops((0, 0, 0))
    got = np.asarray(ops["TranslateXRel"](img, 10, StubRng(r=0.9)))
    want = np.asarray(
        img.transform(
            img.size, Image.AFFINE, (1, 0, 0.45 * 20, 0, 1, 0),
            Image.BICUBIC, fillcolor=(0, 0, 0),
        )
    )
    np.testing.assert_array_equal(got, want)


def test_enhance_factor_curve():
    assert _timm_enhance_factor(9, StubRng(r=0.9)) == 1.0 + 0.81
    assert _timm_enhance_factor(9, StubRng(r=0.4)) == 1.0 - 0.81
    assert _timm_enhance_factor(0, StubRng(r=0.9)) == 1.0


def test_color_increasing_matches_pil_enhance():
    img = gradient_img()
    got = np.asarray(_timm_ops((0, 0, 0))["ColorIncreasing"](img, 9, StubRng(r=0.9)))
    want = np.asarray(ImageEnhance.Color(img).enhance(1.81))
    np.testing.assert_array_equal(got, want)


def test_apply_probability_semantics():
    img = gradient_img()
    rng = np.random.default_rng(0)
    # prob=0 never applies: output identical for any seed
    out = timm_rand_augment(img, rng, num_layers=8, magnitude=10, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    # default prob=0.5: over many trials some layers must apply and some skip
    applied = skipped = 0
    for seed in range(64):
        r = np.random.default_rng(seed)
        o = timm_rand_augment(img, r, num_layers=2, magnitude=10)
        if np.array_equal(np.asarray(o), np.asarray(img)):
            skipped += 1
        else:
            applied += 1
    assert applied > 10 and skipped > 2, (applied, skipped)


def test_magnitude_jitter_clamped():
    img = gradient_img()
    rng = np.random.default_rng(0)
    # huge mstd must clamp into [0, 10] and never crash an op
    for _ in range(50):
        timm_rand_augment(img, rng, num_layers=2, magnitude=9, mstd=100.0, prob=1.0)


def test_grayscale_mode_supported():
    img = gradient_img(mode="L")
    rng = np.random.default_rng(3)
    for _ in range(30):
        timm_rand_augment(img, rng, num_layers=2, magnitude=9, prob=1.0, fill=(128,))
