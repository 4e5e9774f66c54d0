"""Data pipeline tests: synthetic loaders, split policy, transforms."""

import numpy as np
import pytest

from vitsom_tpu.config import AugmentConfig, Config, DataConfig, SOMConfig, ViTConfig
from vitsom_tpu.data import augment as aug_lib
from vitsom_tpu.data.datasets import load_raw, make_synthetic
from vitsom_tpu.data.pipeline import build_datamodule


def cluster_cfg(n=512):
    return Config(
        model_arch="vit_som",
        batch_size=64,
        som=SOMConfig(map_size=(4, 4), distance_fcn="cosine"),
        vit=ViTConfig(patch_size=2, emb_dim=8, depth=1, heads=2, dec_emb_dim=4, dec_depth=1),
        data=DataConfig(dataset="mnist", num_classes=0, num_channels=1, input_size=28,
                        allow_synthetic=True, synthetic_size=n),
    ).validate()


def cls_cfg(n=512):
    return Config(
        model_arch="vit",
        batch_size=64,
        vit=ViTConfig(patch_size=4, emb_dim=8, depth=1, heads=2, dec_emb_dim=4, dec_depth=1),
        data=DataConfig(
            dataset="cifar-10", num_classes=10, num_channels=3, input_size=32,
            allow_synthetic=True, synthetic_size=n,
            augment=AugmentConfig(horizontal_flip=0.5, randaug_n=2,
                                  resize_scale=(0.08, 1.0), resize_ratio=(0.75, 1.3333),
                                  reprob=0.25, autoaugment=True),
        ),
    ).validate()


def test_synthetic_deterministic():
    cfg = cluster_cfg().data
    a = make_synthetic(cfg)
    b = make_synthetic(cfg)
    np.testing.assert_array_equal(a.train_x, b.train_x)
    np.testing.assert_array_equal(a.train_y, b.train_y)


def test_synthetic_native_size():
    """Synthetic stand-ins are generated at the real dataset's STORED
    resolution, not input_size: cifar-10 sources are 32x32 even when the
    config upsizes to 224 (mobile_vit), mirroring the reference's
    store-small/resize-in-transform layout (/root/reference/data/data.py:
    254-315). Generating at 224 made a 7.5 GB device-resident u8 buffer
    that OOM'd the chip (family_bench_r3/mobile_vit.log)."""
    import dataclasses

    base = cls_cfg().data
    big = make_synthetic(dataclasses.replace(base, input_size=224, synthetic_size=64))
    assert big.train_x.shape[1:] == (32, 32, 3)
    # unknown dataset names still follow input_size (pure-synthetic tests)
    syn = make_synthetic(
        dataclasses.replace(base, dataset="synthetic", input_size=24, synthetic_size=64)
    )
    assert syn.train_x.shape[1:] == (24, 24, 3)


def test_synthetic_overlap_mode():
    """synthetic_overlap > 0 produces genuinely confusable classes: even the
    label-supervised nearest-centroid classifier misclassifies a tunable
    fraction, while the legacy generator stays trivially separable."""
    import dataclasses

    base = cluster_cfg().data
    easy = make_synthetic(dataclasses.replace(base, synthetic_size=2000))
    hard = make_synthetic(
        dataclasses.replace(base, synthetic_size=2000, synthetic_overlap=0.1)
    )

    def nearest_centroid_error(splits):
        x = splits.train_x.reshape(len(splits.train_y), -1).astype(np.float32)
        y = splits.train_y
        ks = np.unique(y)
        cents = np.stack([x[y == k_].mean(axis=0) for k_ in ks])
        d = ((x[:, None, :] - cents[None]) ** 2).sum(-1)
        return float(np.mean(ks[np.argmin(d, axis=1)] != y))

    assert nearest_centroid_error(easy) < 0.01
    err = nearest_centroid_error(hard)
    # pairwise Bayes error 0.1 over 10 classes: multi-class error lands
    # well inside (0.05, 0.5) — far from both separable and random
    assert 0.05 < err < 0.5, err


def test_synthetic_train_test_consistent():
    """Train and test splits must share class-conditional structure (one
    template draw per dataset, not per gen() call): a nearest-centroid
    classifier FIT ON TRAIN must transfer to TEST. Regression guard — a
    previous generator re-drew templates inside gen(), so test classes were
    unrelated to train classes and 500-epoch TPU classification runs scored
    ~random test accuracy while val (carved from train) scored 1.0."""
    import dataclasses

    base = cluster_cfg().data
    for overlap in (0.0, 0.1):
        # overlap mode needs enough TEST rows per class (8000/5/10 = 160)
        # that class-mean estimation noise sits well below the designed
        # delta-separation; 8000 stays under the disk-cache threshold
        splits = make_synthetic(
            dataclasses.replace(base, synthetic_size=2000 if overlap == 0.0
                                else 8000, synthetic_overlap=overlap)
        )
        xtr = splits.train_x.reshape(len(splits.train_y), -1).astype(np.float32)
        xte = splits.test_x.reshape(len(splits.test_y), -1).astype(np.float32)
        ks = np.unique(splits.train_y)
        ctr = np.stack([xtr[splits.train_y == k_].mean(axis=0) for k_ in ks])
        cte = np.stack([xte[splits.test_y == k_].mean(axis=0) for k_ in ks])
        # each train-class mean's nearest TEST-class mean must be the same
        # class (with per-call templates the pairing was random, ~1/10 hits)
        d = ((ctr[:, None, :] - cte[None]) ** 2).sum(-1)
        assert (np.argmin(d, axis=1) == np.arange(len(ks))).all(), (
            overlap, np.argmin(d, axis=1))
        if overlap == 0.0:
            # separable templates: per-sample transfer is near-perfect too
            ds = ((xte[:, None, :] - ctr[None]) ** 2).sum(-1)
            acc = float(np.mean(ks[np.argmin(ds, axis=1)] == splits.test_y))
            assert acc > 0.99, acc


def test_clustering_split_concat():
    cfg = cluster_cfg(500)
    dm = build_datamodule(cfg)
    # concat of train (500) + test (100)
    assert dm.n_train == 600
    assert dm.val is None and dm.test is None
    assert dm.steps_per_epoch == 600 // 64  # drop_last
    assert dm.is_static  # no augs configured


def test_classification_split_80_20():
    cfg = cls_cfg(500)
    dm = build_datamodule(cfg)
    assert len(dm.train) == 400
    assert len(dm.val) == 100
    assert len(dm.test) == 100
    assert not dm.is_static  # augmented


def test_device_arrays_scale():
    cfg = cluster_cfg(256)
    dm = build_datamodule(cfg)
    x, y = dm.device_arrays(dm.train)
    assert x.shape == (len(dm.train), 28, 28, 1)
    assert float(x.max()) <= 1.0 and float(x.min()) >= 0.0
    assert y.shape == (len(dm.train),)


def test_train_batches_augmented():
    cfg = cls_cfg(256)
    dm = build_datamodule(cfg)
    batches = list(dm.train_batches(epoch=0))
    assert len(batches) == len(dm.train) // 64
    b = batches[0]
    assert b["image"].shape == (64, 32, 32, 3)
    assert b["image"].dtype == np.float32
    # normalized: values not confined to [0,1]
    assert b["image"].min() < 0


def test_train_batches_epoch_shuffle_differs():
    cfg = cls_cfg(256)
    dm = build_datamodule(cfg)
    b0 = next(iter(dm.train_batches(epoch=0)))
    b1 = next(iter(dm.train_batches(epoch=1)))
    assert not np.array_equal(b0["label"], b1["label"])


def test_eval_batches_drop_last():
    cfg = cls_cfg(500)
    dm = build_datamodule(cfg)
    n = sum(len(b["label"]) for b in dm.eval_batches(dm.test, drop_last=True))
    assert n == (len(dm.test) // 64) * 64


def test_eval_transform_center_crop():
    cfg = cls_cfg().data
    tf = aug_lib.make_eval_transform(cfg)
    x = (np.random.default_rng(0).uniform(size=(40, 40, 3)) * 255).astype(np.uint8)
    out = tf(x)
    assert out.shape == (32, 32, 3)


def test_tf_rrc_bounds():
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray((np.ones((28, 28, 3)) * 128).astype(np.uint8))
    out = aug_lib.tf_random_resized_crop(img, rng, 32, (0.08, 1.0), (0.75, 1.3333))
    assert out.size == (32, 32)


def test_rand_augment_runs_all_magnitudes():
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray((np.random.default_rng(1).uniform(size=(32, 32, 3)) * 255).astype(np.uint8))
    for m in [0, 5, 9, 10]:
        out = aug_lib.rand_augment(img, rng, num_ops=2, magnitude=m)
        assert out.size == (32, 32)


def test_random_erasing_applies():
    rng = np.random.default_rng(0)
    x = np.zeros((32, 32, 3), np.float32)
    out = aug_lib.random_erasing(x.copy(), rng, prob=1.0)
    assert np.abs(out).sum() > 0  # noise filled somewhere
    out2 = aug_lib.random_erasing(x.copy(), rng, prob=0.0)
    assert np.abs(out2).sum() == 0


def test_mnist_family_transform_is_tensor_only():
    cfg = cluster_cfg().data
    tf = aug_lib.make_train_transform(cfg)
    x = (np.arange(28 * 28, dtype=np.uint8).reshape(28, 28, 1) % 255)
    out = tf(x, np.random.default_rng(0))
    np.testing.assert_allclose(out, x.astype(np.float32) / 255.0)


def test_unknown_dataset_raises():
    cfg = Config(data=DataConfig(dataset="nope"))
    with pytest.raises(ValueError):
        load_raw(cfg.data)


def test_missing_dataset_raises_without_synthetic():
    cfg = Config(data=DataConfig(dataset="cifar-10", data_dir="/nonexistent"))
    with pytest.raises(FileNotFoundError):
        load_raw(cfg.data)


def test_worker_pool_reused_across_epochs():
    """The fork pool must be created once per split and reused (re-forking +
    re-pickling the dataset per epoch dominated augmented-epoch time)."""
    from vitsom_tpu.data import pipeline as pl_mod

    import dataclasses

    base = cls_cfg(n=192)
    cfg = dataclasses.replace(
        base, data=dataclasses.replace(base.data, num_workers=2)
    )
    dm = pl_mod.build_datamodule(cfg)
    assert dm.train.pool is None
    b1 = list(dm.train_batches(epoch=0, seed=3))
    pool = dm.train.pool
    assert pool is not None
    b2 = list(dm.train_batches(epoch=1, seed=3))
    assert dm.train.pool is pool
    assert b1[0]["image"].shape == b2[0]["image"].shape
    # same (epoch, seed) replays identically through the pool
    b1r = list(dm.train_batches(epoch=0, seed=3))
    np.testing.assert_allclose(b1[0]["image"], b1r[0]["image"])
    pl_mod.close_pools(dm)
    assert dm.train.pool is None


def test_device_augment_gate():
    """use_device_augment: on for uniform uint8 augmented sources, off for
    static transforms, off when the config disables it, off for object
    arrays (variable-size sources)."""
    import numpy as np

    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule

    base = {
        "data.allow_synthetic": True,
        "data.synthetic_size": 64,
        "data.num_workers": 0,
        "batch_size": 8,
    }
    cfg = load_config("configs/vit_som/vit_som_cifar-10.yaml", overrides=base)
    dm = build_datamodule(cfg)
    assert dm.use_device_augment and not dm.is_static

    cfg_off = load_config(
        "configs/vit_som/vit_som_cifar-10.yaml",
        overrides={**base, "data.device_augment": False},
    )
    dm_off = build_datamodule(cfg_off)
    assert not dm_off.use_device_augment

    # static-transform dataset: scan path, not the augment path
    cfg_mnist = load_config("configs/vit_som/vit_som_mnist.yaml", overrides=base)
    dm_mnist = build_datamodule(cfg_mnist)
    assert dm_mnist.is_static and not dm_mnist.use_device_augment

    # variable-size (object-array) source must fall back to the host path
    dm.train.x = np.empty((len(dm.train.y),), dtype=object)
    assert not dm.use_device_augment
