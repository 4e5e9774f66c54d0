"""Model shape/init/behavior tests (ViT autoencoder, ViT-SOM, DESOM)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitsom_tpu.config import (
    AEConfig,
    Config,
    DataConfig,
    SOMConfig,
    ViTConfig,
)
from vitsom_tpu.models.ae import build_autoencoder
from vitsom_tpu.models.desom import DESOM
from vitsom_tpu.models.vit import ViTAutoencoder, patchify, unpatchify
from vitsom_tpu.models.vit_som import ViTClassifier, ViTSOM
from vitsom_tpu.ops.pos_embed import get_2d_sincos_pos_embed, interpolate_pos_embed


def small_cluster_cfg(**kw):
    return Config(
        model_arch="vit_som",
        total_epochs=2,
        batch_size=4,
        gamma=0.005,
        som=SOMConfig(map_size=(4, 4), t_max=5.0, t_min=0.1, distance_fcn="cosine"),
        vit=ViTConfig(patch_size=2, emb_dim=16, depth=2, heads=2, dec_emb_dim=4, dec_depth=1),
        data=DataConfig(dataset="mnist", num_classes=0, num_channels=1, input_size=28),
        **kw,
    ).validate()


def small_cls_cfg():
    return Config(
        model_arch="vit_som",
        total_epochs=2,
        batch_size=4,
        gamma=0.01,
        som=SOMConfig(map_size=(4, 4), t_max=4.0, t_min=0.1, distance_fcn="cosine"),
        vit=ViTConfig(patch_size=4, emb_dim=24, depth=2, heads=3, dec_emb_dim=12, dec_depth=1),
        data=DataConfig(dataset="cifar-10", num_classes=10, num_channels=3, input_size=32),
    ).validate()


def test_patchify_roundtrip_and_order():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    p = patchify(imgs, 4)
    assert p.shape == (2, 4, 48)
    back = unpatchify(p, 4, 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(imgs), rtol=1e-6)
    # intra-patch ordering is (p, q, c) — matches reference nhwpqc layout
    np.testing.assert_allclose(np.asarray(p[0, 0, :3]), np.asarray(imgs[0, 0, 0, :]))


def test_sincos_pos_embed_oracle():
    # independent re-derivation of tools/utils.py:131-178 semantics
    emb = get_2d_sincos_pos_embed(8, 2, cls_token=True)
    assert emb.shape == (5, 8)
    np.testing.assert_allclose(emb[0], 0.0)
    # position (0,0): sin(0)=0, cos(0)=1 in both halves
    np.testing.assert_allclose(emb[1], [0, 0, 1, 1, 0, 0, 1, 1], atol=1e-7)
    # reference quirk (tools/utils.py:139 "w goes first"): the FIRST half
    # encodes the column coordinate, the second half the row. Token index 3
    # is grid position (row=1, col=0).
    omega = 1.0 / 10000 ** (np.arange(2) / 2.0)
    np.testing.assert_allclose(emb[3, :4], [0, 0, 1, 1], atol=1e-7)
    expect_row = np.concatenate([np.sin(1 * omega), np.cos(1 * omega)])
    np.testing.assert_allclose(emb[3, 4:], expect_row, rtol=1e-6)


def test_vit_autoencoder_shapes():
    model = ViTAutoencoder(
        img_size=28, patch_size=2, in_chans=1, embed_dim=16, depth=2, num_heads=2,
        decoder_embed_dim=4, decoder_depth=1, decoder_num_heads=2,
    )
    x = jnp.zeros((2, 28, 28, 1))
    params = model.init(jax.random.key(0), x)["params"]
    cls_tok, patches, recon = model.apply({"params": params}, x)
    assert cls_tok.shape == (2, 16)
    assert patches.shape == (2, 196, 16)
    assert recon.shape == (2, 28, 28, 1)


def test_vit_som_forward_clustering():
    cfg = small_cluster_cfg()
    model = ViTSOM(cfg)
    x = jnp.zeros((4, 28, 28, 1))
    params = model.init(jax.random.key(0), x)["params"]
    cls_tok, recon, logits, distances, bmu = model.apply({"params": params}, x)
    assert logits is None
    assert distances.shape == (4, 16)
    assert bmu.shape == (4,)
    # latent dim = emb * num_patches
    assert params["prototypes"].shape == (16, 16 * 196)


def test_vit_som_forward_classification():
    cfg = small_cls_cfg()
    model = ViTSOM(cfg)
    x = jnp.zeros((4, 32, 32, 3))
    params = model.init(jax.random.key(0), x)["params"]
    _, _, logits, distances, _ = model.apply({"params": params}, x)
    assert logits.shape == (4, 10)
    assert distances.shape == (4, 16)


def test_vit_classifier():
    cfg = small_cls_cfg()
    model = ViTClassifier(cfg)
    x = jnp.zeros((4, 32, 32, 3))
    params = model.init(jax.random.key(0), x)["params"]
    logits = model.apply({"params": params}, x)
    assert logits.shape == (4, 10)


def test_desom_forward():
    cfg = Config(
        model_arch="desom",
        total_epochs=2,
        batch_size=8,
        gamma=0.001,
        som=SOMConfig(map_size=(8, 8), t_max=8.0, t_min=0.1, distance_fcn="manhattan"),
        ae=AEConfig(encoder_dims=(64, 10)),
        data=DataConfig(dataset="mnist", num_classes=0, num_channels=1, input_size=28),
    ).validate()
    model = DESOM(cfg)
    x = jnp.zeros((8, 784))
    params = model.init(jax.random.key(0), x)["params"]
    logits, z, distances, bmu = model.apply({"params": params}, x)
    assert logits is None
    assert z.shape == (8, 10)
    assert distances.shape == (8, 64)
    decoded = model.apply({"params": params}, z, method="decode")
    assert decoded.shape == (8, 784)


def test_ae_symmetric_dims():
    cfg = Config(
        model_arch="desom",
        ae=AEConfig(encoder_dims=(500, 500, 2000, 10)),
        data=DataConfig(num_channels=1, input_size=28),
    )
    ae = build_autoencoder(cfg)
    x = jnp.zeros((2, 784))
    params = ae.init(jax.random.key(0), x)["params"]
    enc = params["encoder"]
    assert enc["dense_0"]["kernel"].shape == (784, 500)
    assert enc["dense_3"]["kernel"].shape == (2000, 10)
    dec = params["decoder"]
    assert dec["dense_0"]["kernel"].shape == (10, 2000)
    assert dec["dense_3"]["kernel"].shape == (500, 784)


def test_decode_prototypes_batched():
    cfg = small_cluster_cfg()
    model = ViTSOM(cfg)
    x = jnp.zeros((2, 28, 28, 1))
    variables = model.init(jax.random.key(0), x)
    protos = variables["params"]["prototypes"]
    imgs = model.apply(variables, protos, method="decode_prototypes")
    assert imgs.shape == (16, 28, 28, 1)


def test_attention_return_attn():
    model = ViTAutoencoder(
        img_size=8, patch_size=2, in_chans=1, embed_dim=8, depth=2, num_heads=2,
        decoder_embed_dim=4, decoder_depth=1, decoder_num_heads=2,
    )
    x = jnp.ones((2, 8, 8, 1))
    params = model.init(jax.random.key(0), x)["params"]
    cls_tok, patches, recon, attns = model.apply(
        {"params": params}, x, return_attns=True
    )
    assert len(attns) == 2
    assert attns[0].shape == (2, 2, 17, 17)
    rows = np.asarray(attns[0]).sum(-1)
    np.testing.assert_allclose(rows, 1.0, rtol=1e-5)


def test_interpolate_pos_embed():
    p = get_2d_sincos_pos_embed(16, 7, cls_token=True)
    q = interpolate_pos_embed(p, 14)
    assert q.shape == (1 + 14 * 14, 16)
    np.testing.assert_allclose(q[0], p[0])  # CLS row passes through
    same = interpolate_pos_embed(p, 7)
    np.testing.assert_allclose(same, p)
