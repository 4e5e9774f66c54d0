"""Parity tests: device (jax) augmentation vs the host PIL reference path.

Color/LUT ops must match PIL within 1 LSB (they are integer-exact math);
geometric ops share PIL's matrix conventions and bicubic kernel but not its
fixed-point arithmetic, so they get small mean-error tolerances. Sampling
DISTRIBUTIONS (RRC boxes, erasing rects) are asserted statistically — the
RNG streams differ from numpy by design."""

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

import jax
import jax.numpy as jnp

from vitsom_tpu.data import device_augment as da


def _img(seed=0, s=32, c=3):
    return np.random.default_rng(seed).integers(0, 256, (s, s, c), np.uint8)


def _smooth_img(s=32):
    """Low-frequency test image: resampling parity tolerances are meaningful
    on natural-ish content (white noise amplifies sub-pixel phase to full
    LSBs and tests only the tolerance, not the convention)."""
    yy, xx = np.mgrid[0:s, 0:s]
    return np.stack(
        [
            (yy * 4 + xx * 2) % 256,
            128 + 100 * np.sin(xx / 5.0),
            (255 - xx * 5) % 256,
        ],
        -1,
    ).astype(np.uint8)


def _run_color(name, x, mag=0.5, signed=False, timm=True):
    """Apply a single color op via the table-select machinery."""
    names = da._TIMM_OPS if timm else da._TV_OPS
    k = names.index(name)
    out = da._apply_color_table(
        jnp.asarray(x, jnp.float32),
        names,
        jnp.asarray(k),
        jnp.asarray(mag, jnp.float32),
        jnp.asarray(signed),
        timm,
    )
    return np.asarray(out)


# ---------------------------------------------------------------------------
# LUT / color ops: integer-exact vs PIL
# ---------------------------------------------------------------------------


def test_invert_exact():
    x = _img(1)
    ref = np.asarray(ImageOps.invert(Image.fromarray(x)))
    np.testing.assert_array_equal(_run_color("Invert", x), ref)


@pytest.mark.parametrize("mag,bits", [(0.0, 4), (0.3, 3), (0.6, 2), (0.99, 1)])
def test_posterize_increasing_exact(mag, bits):
    x = _img(2)
    got = _run_color("PosterizeIncreasing", x, mag=mag)
    expect_bits = max(4 - int(mag * 4), 1)
    assert expect_bits == bits
    ref = np.asarray(ImageOps.posterize(Image.fromarray(x), bits))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("mag", [0.0, 0.25, 0.5, 0.9])
def test_solarize_increasing_exact(mag):
    x = _img(3)
    thresh = 256 - int(mag * 256)
    ref = np.asarray(ImageOps.solarize(Image.fromarray(x), thresh))
    np.testing.assert_array_equal(_run_color("SolarizeIncreasing", x, mag=mag), ref)


def test_solarize_add_exact():
    x = _img(4)
    add = int(0.5 * 110)
    lut = [min(255, i + add) if i < 128 else i for i in range(256)]
    ref = np.asarray(Image.fromarray(x).point(lut * 3))
    np.testing.assert_array_equal(_run_color("SolarizeAdd", x, mag=0.5), ref)


def test_autocontrast_close():
    x = _img(5)
    ref = np.asarray(ImageOps.autocontrast(Image.fromarray(x))).astype(np.float32)
    got = _run_color("AutoContrast", x)
    # PIL LUT rounds with int(ix) after +0.5; allow 1 LSB
    assert np.abs(got - ref).max() <= 1.0


def test_equalize_exact():
    x = _img(6)
    ref = np.asarray(ImageOps.equalize(Image.fromarray(x))).astype(np.float32)
    got = np.asarray(da.op_equalize(jnp.asarray(x, jnp.float32)))
    np.testing.assert_array_equal(got, ref)


def test_equalize_flat_image_identity():
    x = np.full((32, 32, 3), 77, np.uint8)
    ref = np.asarray(ImageOps.equalize(Image.fromarray(x))).astype(np.float32)
    got = np.asarray(da.op_equalize(jnp.asarray(x, jnp.float32)))
    np.testing.assert_array_equal(got, ref)


def test_ra_layer_equalize_subset_path():
    """Equalize runs on a gathered subset inside _ra_layer (perf: only the
    images that drew the op); selected images must come out exactly
    PIL-equalized, unselected ones untouched."""
    b = 16
    rng = np.random.default_rng(20)
    xs = rng.integers(0, 256, (b, 32, 32, 3), np.uint8)
    names = da._TIMM_OPS
    k_eq = names.index("Equalize")
    # force a mix: half the batch draws Equalize (via many trials of the
    # real layer we'd wait forever; call the layer internals directly)
    op_idx = jnp.asarray([k_eq if i % 2 == 0 else names.index("Invert")
                          for i in range(b)])
    applied = jnp.ones((b,), bool)
    x = jnp.asarray(xs, jnp.float32)
    color = jax.vmap(
        lambda xi, oi: da._apply_color_table(
            xi, names, oi, jnp.asarray(0.5), jnp.asarray(False), True
        )
    )(x, op_idx)
    want_eq = op_idx == k_eq
    sel = jnp.argsort(~want_eq, stable=True)[: min(24, b)]
    eq_full = x.at[sel].set(jax.vmap(da.op_equalize)(x[sel]))
    out = np.asarray(jnp.where(want_eq[:, None, None, None], eq_full, color))
    for i in range(b):
        if i % 2 == 0:
            ref = np.asarray(ImageOps.equalize(Image.fromarray(xs[i])))
            np.testing.assert_array_equal(out[i], ref.astype(np.float32))
        else:
            ref = np.asarray(ImageOps.invert(Image.fromarray(xs[i])))
            np.testing.assert_array_equal(out[i], ref.astype(np.float32))


@pytest.mark.parametrize("name,enhancer", [
    ("BrightnessIncreasing", ImageEnhance.Brightness),
    ("ColorIncreasing", ImageEnhance.Color),
    ("ContrastIncreasing", ImageEnhance.Contrast),
])
@pytest.mark.parametrize("signed", [False, True])
def test_enhance_ops_close(name, enhancer, signed):
    x = _img(7)
    mag = 0.9  # level fraction; factor = 1 +/- 0.9*0.9
    factor = 1.0 + (-1 if signed else 1) * mag * 0.9
    ref = np.asarray(enhancer(Image.fromarray(x)).enhance(factor)).astype(np.float32)
    got = _run_color(name, x, mag=mag, signed=signed)
    assert np.abs(got - ref).max() <= 1.0, np.abs(got - ref).max()


def test_sharpness_close():
    x = _img(8)
    factor = 1.0 + 0.5 * 0.9
    ref = np.asarray(
        ImageEnhance.Sharpness(Image.fromarray(x)).enhance(factor)
    ).astype(np.float32)
    got = _run_color("SharpnessIncreasing", x, mag=0.5)
    # interior must match to 1 LSB; PIL border handling is copy-through,
    # replicated exactly, so the whole image gets the same bound
    assert np.abs(got - ref).max() <= 1.0, np.abs(got - ref).max()


# ---------------------------------------------------------------------------
# geometric ops
# ---------------------------------------------------------------------------


def test_warp_identity_is_exact():
    x = _img(9).astype(np.float32)
    out = da._warp(jnp.asarray(x)[None], da._identity_mats(1), 32)
    np.testing.assert_allclose(np.asarray(out)[0], x, atol=1e-3)


def test_warp_integer_translate_matches_pil():
    x = _img(10)
    v = 5.0
    mats = da._mat_translate_x(jnp.asarray([v]))
    out = np.asarray(da._warp(jnp.asarray(x, jnp.float32)[None], mats, 32)[0])
    ref = np.asarray(
        Image.fromarray(x).transform(
            (32, 32), Image.AFFINE, (1, 0, v, 0, 1, 0), Image.BICUBIC
        )
    ).astype(np.float32)
    np.testing.assert_allclose(np.round(out), ref, atol=1.0)


@pytest.mark.parametrize("angle", [17.0, -30.0])
def test_rotate_matches_pil(angle):
    x = _smooth_img()
    mats = da._mat_rotate(jnp.asarray([angle]), 32.0)
    out = np.round(np.asarray(da._warp(jnp.asarray(x, jnp.float32)[None], mats, 32)[0]))
    ref = np.asarray(
        Image.fromarray(x).rotate(angle, Image.BICUBIC, fillcolor=0)
    ).astype(np.float32)
    # float vs Pillow 16.16 fixed-point bicubic: sub-LSB on smooth content
    err = np.abs(out - ref)
    assert np.mean(err) < 1.0, np.mean(err)
    assert err.max() <= 4.0, err.max()


@pytest.mark.parametrize("shear", [0.2, -0.3])
def test_shear_x_matches_pil(shear):
    x = _smooth_img()
    mats = da._mat_shear_x(jnp.asarray([shear]))
    out = np.round(np.asarray(da._warp(jnp.asarray(x, jnp.float32)[None], mats, 32)[0]))
    ref = np.asarray(
        Image.fromarray(x).transform(
            (32, 32), Image.AFFINE, (1, shear, 0, 0, 1, 0), Image.BICUBIC
        )
    ).astype(np.float32)
    err = np.abs(out - ref)
    assert np.mean(err) < 1.0, np.mean(err)
    assert err.max() <= 4.0, err.max()


def test_crop_resize_matches_pil_upscale():
    """RRC warp vs PIL resize(box=...) for an upscaling crop (the common
    case in every shipped config: crop <= source, output == input size)."""
    x = _smooth_img()
    j, i, w, h = 4, 6, 20, 18
    mats = da._crop_matrix(
        jnp.asarray([j]), jnp.asarray([i]), jnp.asarray([w], jnp.float32),
        jnp.asarray([h], jnp.float32), 32,
    )
    out = np.round(np.asarray(da._warp(jnp.asarray(x, jnp.float32)[None], mats, 32)[0]))
    ref = np.asarray(
        Image.fromarray(x).resize((32, 32), Image.BICUBIC, box=(j, i, j + w, i + h))
    ).astype(np.float32)
    err = np.abs(out - ref)
    assert np.mean(err) < 3.0, np.mean(err)
    assert np.median(err) <= 1.0


def test_full_box_crop_is_near_identity():
    x = _img(14).astype(np.float32)
    mats = da._crop_matrix(
        jnp.asarray([0]), jnp.asarray([0]), jnp.asarray([32.0]),
        jnp.asarray([32.0]), 32,
    )
    out = np.asarray(da._warp(jnp.asarray(x)[None], mats, 32)[0])
    np.testing.assert_allclose(out, x, atol=1e-2)


# ---------------------------------------------------------------------------
# parameter distributions
# ---------------------------------------------------------------------------


def test_torch_rrc_distribution_matches_host():
    """Crop area/aspect quantiles from the device sampler must match the
    host torchvision-semantics sampler."""
    from vitsom_tpu.data.augment import torch_random_resized_crop  # noqa: F401

    b = 4096
    mats = da.sample_torch_rrc(jax.random.key(0), b, 32, 32, 32)
    mats = np.asarray(mats)
    w = mats[:, 0, 0] * 32  # sx * S
    h = mats[:, 1, 1] * 32
    areas = (w * h) / (32 * 32)
    # host draw of the same distribution
    rng = np.random.default_rng(0)
    host_areas = []
    for _ in range(b):
        area = 32 * 32
        for _a in range(10):
            ta = area * rng.uniform(0.08, 1.0)
            ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            ww = int(round(np.sqrt(ta * ar)))
            hh = int(round(np.sqrt(ta / ar)))
            if 0 < ww <= 32 and 0 < hh <= 32:
                host_areas.append(ww * hh / area)
                break
        else:
            host_areas.append(1.0)
    host_areas = np.asarray(host_areas)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        dq = np.quantile(areas, q)
        hq = np.quantile(host_areas, q)
        assert abs(dq - hq) < 0.05, (q, dq, hq)


def test_erasing_fraction_matches_prob():
    x = jnp.zeros((512, 32, 32, 3), jnp.float32)
    out = np.asarray(da._random_erase(jax.random.key(1), x, prob=0.25,
                                      mode="pixel", count=1))
    erased = (np.abs(out).reshape(512, -1).max(axis=1) > 0).mean()
    assert 0.15 < erased < 0.35, erased


def test_hflip_prob():
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(512, 8, 8, 1)).astype(np.float32)
    )
    out = np.asarray(da._hflip(jax.random.key(2), x, 0.5))
    flipped = (np.abs(out - np.asarray(x)).reshape(512, -1).max(axis=1) > 0).mean()
    assert 0.4 < flipped < 0.6


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------


def test_full_pipeline_stats_match_host():
    """End-to-end: device pipeline output statistics must straddle the host
    pipeline's (same raw batch, many draws)."""
    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.augment import make_train_transform

    cfg = load_config("configs/vit_som/vit_som_cifar-10.yaml")
    raw = np.random.default_rng(3).integers(0, 256, (64, 32, 32, 3), np.uint8)

    dev_fn = jax.jit(da.make_device_train_augment(cfg.data))
    dev = np.asarray(dev_fn(jax.random.key(0), jnp.asarray(raw)))

    host_fn = make_train_transform(cfg.data)
    rng = np.random.default_rng(0)
    host = np.stack([host_fn(raw[i], rng) for i in range(64)])

    assert dev.shape == host.shape
    # same normalization domain and comparable dispersion
    assert abs(float(dev.mean()) - float(host.mean())) < 0.35
    assert 0.5 < float(dev.std()) / float(host.std()) < 1.8
    assert np.isfinite(dev).all()
