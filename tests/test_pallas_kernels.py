"""Pallas kernel equivalence tests vs. the XLA oracles.

Run on the CPU test mesh via Pallas interpreter mode (the kernels detect
non-TPU backends and set ``interpret=True``), so the exact code path that
compiles on TPU is validated in CI — SURVEY.md §4's
"Pallas-kernel-vs-XLA-reference equivalence tests".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitsom_tpu.ops.attention import xla_attention
from vitsom_tpu.ops.attention_pallas import fused_attention
from vitsom_tpu.ops import som_pallas
from vitsom_tpu.som import layer as som


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "b,n,h,hd",
    [
        (2, 197, 2, 8),  # vit_som mnist clustering shape (emb 16, heads 2)
        (2, 65, 3, 64),  # vit_som cifar cls shape (emb 192, heads 3)
        (1, 17, 4, 48),  # decoder-ish odd shape
    ],
)
def test_fused_attention_matches_xla(b, n, h, hd):
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, n, h, hd), jnp.float32)
    k = jax.random.normal(kk, (b, n, h, hd), jnp.float32)
    v = jax.random.normal(kv, (b, n, h, hd), jnp.float32)

    ref, _ = xla_attention(q, k, v)
    out = fused_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_fused_attention_grads_match_xla():
    key = jax.random.key(1)
    kq, kk, kv, kg = jax.random.split(key, 4)
    shape = (2, 33, 2, 16)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    cotan = jax.random.normal(kg, shape, jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v) * cotan)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v)[0] * cotan)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5)


def test_fused_attention_jits_inside_larger_fn():
    q = jnp.ones((1, 9, 1, 8), jnp.float32)

    @jax.jit
    def f(q):
        return fused_attention(q, q, q).sum()

    assert np.isfinite(float(f(q)))


# ---------------------------------------------------------------------------
# fused SOM
# ---------------------------------------------------------------------------


def _xla_som(x, protos, grid_d2, temperature, distance_fcn):
    distances = som.compute_distances(x, protos, distance_fcn)
    bmu_idx = som.bmu(distances)
    weights = som.neighborhood_weights(bmu_idx, grid_d2, temperature)
    loss = som.som_loss(jax.lax.stop_gradient(weights), distances)
    return loss, bmu_idx, distances


@pytest.mark.parametrize("distance_fcn", ["cosine", "euclidean"])
@pytest.mark.parametrize("topology", ["square", "hexa"])
@pytest.mark.parametrize(
    "b,map_size,d",
    [
        (16, (8, 8), 40),     # small
        (8, (12, 11), 130),   # non-square map, P=132 not tile-aligned, B<tile
        (13, (24, 24), 65),   # odd batch, P=576
    ],
)
def test_fused_som_matches_xla(distance_fcn, topology, b, map_size, d):
    p = map_size[0] * map_size[1]
    key = jax.random.key(2)
    kx, kp = jax.random.split(key)
    x = jax.random.normal(kx, (b, d), jnp.float32)
    protos = jax.random.normal(kp, (p, d), jnp.float32) * 0.5
    temp = jnp.asarray(3.7, jnp.float32)
    grid_d2 = jnp.asarray(som.grid_sq_distances(map_size, topology))

    loss_ref, bmu_ref, dist_ref = _xla_som(x, protos, grid_d2, temp, distance_fcn)
    fused = som_pallas.make_fused_som(map_size, topology, distance_fcn)
    loss, bmu_idx, dist = jax.jit(fused)(x, protos, temp)

    np.testing.assert_array_equal(np.asarray(bmu_idx), np.asarray(bmu_ref))
    np.testing.assert_allclose(np.asarray(dist), np.asarray(dist_ref), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("distance_fcn", ["cosine", "euclidean"])
def test_fused_som_grads_match_xla(distance_fcn):
    map_size, topology, b, d = (6, 7), "square", 12, 33
    p = map_size[0] * map_size[1]
    key = jax.random.key(3)
    kx, kp = jax.random.split(key)
    x = jax.random.normal(kx, (b, d), jnp.float32)
    protos = jax.random.normal(kp, (p, d), jnp.float32)
    temp = jnp.asarray(1.9, jnp.float32)
    grid_d2 = jnp.asarray(som.grid_sq_distances(map_size, topology))

    fused = som_pallas.make_fused_som(map_size, topology, distance_fcn)

    def loss_fused(x, protos):
        loss, _, _ = fused(x, protos, temp)
        return loss

    def loss_ref(x, protos):
        loss, _, _ = _xla_som(x, protos, grid_d2, temp, distance_fcn)
        return loss

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, protos)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, protos)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r), atol=1e-6, rtol=1e-4)


def test_grid_d2_rows_matches_table():
    for topology in ("square", "hexa"):
        map_size = (5, 9)
        p = map_size[0] * map_size[1]
        table = som.grid_sq_distances(map_size, topology)
        bmu_idx = jnp.asarray([0, 7, 44, 13], jnp.int32)
        rows = som_pallas.grid_d2_rows(bmu_idx, p, map_size[1], topology)
        np.testing.assert_allclose(
            np.asarray(rows), table[np.asarray(bmu_idx)], atol=1e-5, rtol=1e-5
        )


def test_fused_som_rejects_manhattan():
    with pytest.raises(ValueError):
        som_pallas.make_fused_som((8, 8), "square", "manhattan")


# ---------------------------------------------------------------------------
# end-to-end: fused train step == XLA train step
# ---------------------------------------------------------------------------


def test_vit_som_train_step_pallas_matches_xla():
    """Three optimizer steps through the fused SOM path must track the XLA
    path to float tolerance (same grads -> same params evolution)."""
    import dataclasses

    from vitsom_tpu.config import Config, DataConfig, SOMConfig, TrainConfig, ViTConfig
    from vitsom_tpu.models.vit_som import ViTSOM
    from vitsom_tpu.train import optim, schedules
    from vitsom_tpu.train import steps as steps_lib

    def build(use_pallas):
        cfg = Config(
            model_arch="vit_som",
            total_epochs=2,
            batch_size=4,
            gamma=0.005,
            som=SOMConfig(map_size=(4, 4), t_max=5.0, t_min=0.1, distance_fcn="cosine"),
            vit=ViTConfig(patch_size=7, emb_dim=16, depth=1, heads=2, dec_emb_dim=8, dec_depth=1),
            data=DataConfig(dataset="mnist", num_classes=0, num_channels=1, input_size=28),
            train=TrainConfig(use_pallas_som=use_pallas),
        ).validate()
        model = ViTSOM(cfg)
        x = jnp.zeros((4, 28, 28, 1), jnp.float32)
        params = model.init(jax.random.key(0), x)["params"]
        statics = steps_lib.StepStatics(
            steps_per_epoch=3, total_epochs=2, dataset_len=12, batch_size=4
        )
        sched = schedules.make_lr_schedule(
            cfg.optimizer, cfg.total_epochs, 3, optim.base_learning_rate(cfg)
        )
        tx = optim.make_optimizer(cfg, params, sched)
        state = steps_lib.TrainState(
            step=jnp.asarray(0, jnp.int32), params=params, opt_state=tx.init(params)
        )
        step_fn = jax.jit(
            steps_lib.make_vit_som_train_step(cfg, model, tx, statics, sched)
        )
        return state, step_fn

    key = jax.random.key(7)
    xs = jax.random.uniform(key, (3, 4, 28, 28, 1), jnp.float32)
    state_x, step_x = build(False)
    state_p, step_p = build(True)
    for i in range(3):
        batch = {"image": xs[i], "label": jnp.zeros((4,), jnp.int32)}
        state_x, m_x = step_x(state_x, batch)
        state_p, m_p = step_p(state_p, batch)
        np.testing.assert_allclose(
            float(m_p["train/som_loss"]), float(m_x["train/som_loss"]), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            float(m_p["train/total_loss"]), float(m_x["train/total_loss"]), rtol=1e-5, atol=1e-6
        )

    flat_x = jax.tree_util.tree_leaves(state_x.params)
    flat_p = jax.tree_util.tree_leaves(state_p.params)
    for a, b in zip(flat_x, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# DP: fused SOM under shard_map on the 8-device mesh
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("distance_fcn", ["cosine", "euclidean"])
def test_sharded_fused_som_matches_single_device(distance_fcn):
    """The shard_map-wrapped kernel (one Pallas call per batch shard, pmean'd
    loss, psum'd prototype grads) must reproduce the 1-device kernel exactly —
    this is what keeps use_pallas_som live on multi-chip meshes."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    assert mesh.devices.size == 8
    b, d, map_size = 16, 40, (8, 8)
    p = map_size[0] * map_size[1]
    kx, kp = jax.random.split(jax.random.key(11))
    x = jax.random.normal(kx, (b, d), jnp.float32)
    protos = jax.random.normal(kp, (p, d), jnp.float32)
    temp = jnp.asarray(2.3, jnp.float32)

    fused = som_pallas.make_fused_som(map_size, "square", distance_fcn)
    sharded = som_pallas.make_fused_som_sharded(
        map_size, "square", distance_fcn, mesh
    )

    l1, b1, d1 = jax.jit(fused)(x, protos, temp)
    l2, b2, d2 = jax.jit(sharded)(x, protos, temp)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(b1))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=1e-5, atol=1e-6)

    g1 = jax.jit(jax.grad(lambda x, p: fused(x, p, temp)[0], argnums=(0, 1)))(x, protos)
    g2 = jax.jit(jax.grad(lambda x, p: sharded(x, p, temp)[0], argnums=(0, 1)))(x, protos)
    for name, (a, c) in zip(("dx", "dprotos"), zip(g1, g2)):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=1e-4, atol=1e-7, err_msg=name
        )


def test_vit_som_dp8_pallas_matches_single_device(tmp_path):
    """Full Trainer fit: vit_som with use_pallas_som=True on the 8-device DP
    mesh reproduces the 1-device fused run (VERDICT r1 weak #3 — the kernel
    must no longer be auto-disabled under DP)."""
    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

    overrides = {
        "total_epochs": 2,
        "batch_size": 16,
        "som.map_size": [4, 4],
        "vit.depth": 1,
        "vit.emb_dim": 16,
        "data.allow_synthetic": True,
        "data.synthetic_size": 64,
        "train.n_runs": 1,
        "train.use_pallas_som": True,
    }
    results = {}
    for n_dev in (1, 8):
        cfg = load_config(
            "configs/vit_som/vit_som_mnist.yaml",
            overrides={
                **overrides,
                "train.mesh_shape": [n_dev],
                "train.checkpoint_dir": str(tmp_path / f"s{n_dev}"),
                "train.log_dir": str(tmp_path / f"l{n_dev}"),
            },
        )
        dm = build_datamodule(cfg)
        t = Trainer(cfg, dm=dm, run_id=0)
        assert t.mesh.devices.size == n_dev
        assert t.cfg.train.use_pallas_som  # no silent fallback
        t.fit(progress=False)
        results[n_dev] = jax.device_get(t.state.params)

    flat1 = jax.tree_util.tree_leaves(results[1])
    flat8 = jax.tree_util.tree_leaves(results[8])
    for a, b in zip(flat1, flat8):
        # psum reduction order differs from the single-device sum; a few
        # ulps of drift compound through 8 optimizer steps
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# hybrid attention: XLA forward + Pallas backward
# ---------------------------------------------------------------------------


def test_hybrid_attention_matches_xla():
    """impl='hybrid' (XLA fwd, Pallas VMEM-recompute bwd, flash-style
    [B,N,D] residuals) must match the XLA path in values and grads."""
    from vitsom_tpu.ops import attention

    rng = np.random.default_rng(5)
    q, k, v = (
        jnp.asarray(rng.normal(size=(8, 33, 2, 8)).astype(np.float32))
        for _ in range(3)
    )
    o_ref, _ = attention.xla_attention(q, k, v)
    o_hyb = jax.jit(attention.hybrid_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(o_hyb), np.asarray(o_ref),
                               atol=1e-5, rtol=1e-5)

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v)
            out = out[0] if isinstance(out, tuple) else out
            return jnp.sum(out ** 2)
        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

    g_ref = loss(attention.xla_attention)(q, k, v)
    g_hyb = loss(attention.hybrid_attention)(q, k, v)
    for a, b, name in zip(g_ref, g_hyb, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-3, err_msg=name)


# ---------------------------------------------------------------------------
# xla_bf16 attention: native bf16 score/prob tensors
# ---------------------------------------------------------------------------


def test_xla_bf16_attention_matches_xla():
    """impl='xla_bf16' keeps the XLA softmax fusion but stores/computes the
    [B,H,N,N] tensors in bf16 — values and grads must track the f32 path to
    bf16 resolution (~1e-2 relative on probs)."""
    from vitsom_tpu.ops import attention

    rng = np.random.default_rng(7)
    q, k, v = (
        jnp.asarray(rng.normal(size=(8, 33, 2, 8)).astype(np.float32))
        for _ in range(3)
    )
    o_ref, _ = attention.xla_attention(q, k, v)
    o_b16, none_attn = jax.jit(attention.xla_attention_bf16_scores)(q, k, v)
    assert none_attn is None
    np.testing.assert_allclose(np.asarray(o_b16), np.asarray(o_ref),
                               atol=5e-2, rtol=5e-2)

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v)
            out = out[0] if isinstance(out, tuple) else out
            return jnp.sum(out ** 2)
        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

    g_ref = loss(attention.xla_attention)(q, k, v)
    g_b16 = loss(attention.xla_attention_bf16_scores)(q, k, v)
    for a, b, name in zip(g_ref, g_b16, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-1, rtol=1e-1, err_msg=name)


def test_xla_bf16_dispatch():
    from vitsom_tpu.ops import attention

    rng = np.random.default_rng(8)
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 9, 2, 8)).astype(np.float32))
        for _ in range(3)
    )
    out, attn = attention.multi_head_attention(q, k, v, impl="xla_bf16")
    assert attn is None and out.shape == q.shape
    # return_attn falls back to the f32 oracle path
    out2, attn2 = attention.multi_head_attention(
        q, k, v, impl="xla_bf16", return_attn=True
    )
    assert attn2 is not None


def test_xla_bf16_store_matches_xla():
    """impl='xla_bf16s': bf16 score/prob storage, f32 softmax math — tighter
    tolerance than full-bf16 softmax (only bf16 rounding of scores/probs
    differs), and grads must flow through the custom-vjp softmax."""
    from vitsom_tpu.ops import attention

    rng = np.random.default_rng(9)
    q, k, v = (
        jnp.asarray(rng.normal(size=(8, 33, 2, 8)).astype(np.float32))
        for _ in range(3)
    )
    o_ref, _ = attention.xla_attention(q, k, v)
    o_s, _ = jax.jit(attention.xla_attention_bf16_store)(q, k, v)
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_ref),
                               atol=3e-2, rtol=3e-2)

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v)
            out = out[0] if isinstance(out, tuple) else out
            return jnp.sum(out ** 2)
        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

    g_ref = loss(attention.xla_attention)(q, k, v)
    g_s = loss(attention.xla_attention_bf16_store)(q, k, v)
    for a, b, name in zip(g_ref, g_s, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-1, rtol=5e-2, err_msg=name)
