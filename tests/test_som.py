"""SOM core unit tests against numpy oracles replicating the reference
semantics (``/root/reference/models/som_layer.py:60-152``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitsom_tpu.config import SOMConfig
from vitsom_tpu.som import layer as som


def _np_distances(x, protos, fcn):
    if fcn == "manhattan":
        return np.abs(x[:, None, :] - protos[None, :, :]).sum(-1)
    if fcn == "euclidean":
        return np.sqrt(((x[:, None, :] - protos[None, :, :]) ** 2).sum(-1))
    if fcn == "cosine":
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        pn = protos / np.linalg.norm(protos, axis=1, keepdims=True)
        return 1.0 - xn @ pn.T
    raise ValueError(fcn)


@pytest.mark.parametrize("fcn", ["manhattan", "euclidean", "cosine"])
def test_distances_match_oracle(fcn):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 32)).astype(np.float32) + 1.0
    protos = rng.uniform(size=(25, 32)).astype(np.float32)
    got = np.asarray(som.compute_distances(jnp.asarray(x), jnp.asarray(protos), fcn))
    want = _np_distances(x, protos, fcn)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_distances_flatten_ndim():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 7, 3)).astype(np.float32)
    protos = rng.uniform(size=(5, 21)).astype(np.float32)
    got = som.compute_distances(jnp.asarray(x), jnp.asarray(protos), "euclidean")
    want = _np_distances(x.reshape(4, -1), protos, "euclidean")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_square_grid_positions():
    pos = som.grid_positions((3, 4), "square")
    assert pos.shape == (12, 2)
    # row-major (y, x) ordering, reference :61-67
    np.testing.assert_array_equal(pos[0], [0, 0])
    np.testing.assert_array_equal(pos[1], [0, 1])
    np.testing.assert_array_equal(pos[4], [1, 0])
    np.testing.assert_array_equal(pos[-1], [2, 3])


def test_hexa_grid_positions():
    pos = som.grid_positions((3, 3), "hexa")
    # odd rows offset by 0.5 in x, rows pitched sqrt(3)/2 — reference :68-77
    np.testing.assert_allclose(pos[0], [0.0, 0.0])
    np.testing.assert_allclose(pos[3], [0.5, np.sqrt(3) / 2], rtol=1e-6)
    np.testing.assert_allclose(pos[6], [0.0, np.sqrt(3)], rtol=1e-6)


def test_neighborhood_weights_match_reference_formula():
    map_size = (5, 5)
    grid_d2 = jnp.asarray(som.grid_sq_distances(map_size, "square"))
    bmu_idx = jnp.asarray([0, 12, 24], dtype=jnp.int32)
    T = jnp.asarray(2.0)
    got = np.asarray(som.neighborhood_weights(bmu_idx, grid_d2, T))

    pos = som.grid_positions(map_size, "square")
    for b, i in enumerate([0, 12, 24]):
        d = np.linalg.norm(pos - pos[i], axis=1)
        want = np.exp(-(d**2) / (2 * 2.0**2))
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-6)


def test_temperature_schedule_endpoints():
    total = som.total_iterations(70000, 128, 500)  # mnist concat example
    t0 = som.temperature_schedule(jnp.asarray(0), total, 20.0, 0.001)
    t_end = som.temperature_schedule(jnp.asarray(int(total) - 1), total, 20.0, 0.001)
    assert np.isclose(float(t0), 20.0, rtol=1e-5)
    # reference formula hits Tmin at iteration == total_iterations - 1
    assert np.isclose(
        float(som.temperature_schedule(jnp.asarray(total - 1.0), total, 20.0, 0.001)),
        0.001,
        rtol=1e-4,
    )
    assert float(t_end) <= 0.0011


def test_som_loss_is_mean_weighted_distance():
    rng = np.random.default_rng(2)
    w = rng.uniform(size=(8, 25)).astype(np.float32)
    d = rng.uniform(size=(8, 25)).astype(np.float32)
    got = float(som.som_loss(jnp.asarray(w), jnp.asarray(d)))
    assert np.isclose(got, (w * d).mean(), rtol=1e-6)


def test_prototype_init_cosine_normalized():
    cfg = SOMConfig(map_size=(8, 8), distance_fcn="cosine")
    p = som.init_prototypes(jax.random.key(0), cfg, 64)
    norms = np.linalg.norm(np.asarray(p), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    cfg2 = SOMConfig(map_size=(8, 8), distance_fcn="euclidean")
    p2 = np.asarray(som.init_prototypes(jax.random.key(0), cfg2, 64))
    assert p2.min() >= 0.0 and p2.max() < 1.0


def test_index_to_position():
    got = np.asarray(som.index_to_position(jnp.asarray([0, 5, 13]), (4, 5)))
    np.testing.assert_array_equal(got, [[0, 0], [1, 0], [2, 3]])


def test_som_forward_fused():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    protos = jnp.asarray(rng.uniform(size=(16, 32)).astype(np.float32))
    grid_d2 = jnp.asarray(som.grid_sq_distances((4, 4), "square"))
    d, b, w, loss = som.som_forward(x, protos, grid_d2, jnp.asarray(1.5), distance_fcn="cosine")
    assert d.shape == (8, 16) and b.shape == (8,) and w.shape == (8, 16)
    assert np.isclose(float(loss), float((np.asarray(w) * np.asarray(d)).mean()), rtol=1e-5)
    # bmu really is the argmin
    np.testing.assert_array_equal(np.asarray(b), np.asarray(d).argmin(1))


def test_som_gradients_flow_to_x_and_prototypes():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    protos = jnp.asarray(rng.uniform(size=(9, 16)).astype(np.float32))
    grid_d2 = jnp.asarray(som.grid_sq_distances((3, 3), "square"))

    def loss(x, p):
        d = som.compute_distances(x, p, "cosine")
        b = som.bmu(d)
        w = som.neighborhood_weights(b, grid_d2, jnp.asarray(1.0))
        return som.som_loss(jax.lax.stop_gradient(w), d)

    gx, gp = jax.grad(loss, argnums=(0, 1))(x, protos)
    assert np.abs(np.asarray(gx)).sum() > 0
    assert np.abs(np.asarray(gp)).sum() > 0
