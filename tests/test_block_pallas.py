"""Fused transformer-block kernel vs. the XLA Block: values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitsom_tpu.models.vit import Block
from vitsom_tpu.ops import block_pallas


def _xla_block_params_to_fused(params):
    """Map the flax Block param tree onto the fused kernel's weight dict."""
    attn = params["Attention_0"]
    if "query" in attn:
        # dim >= 128: separate q/k/v projections (layout-copy fix,
        # models/vit.py); the fused kernel wants the packed [D, 3D] matrix
        qkv_kernel = jnp.concatenate(
            [attn[nm]["kernel"] for nm in ("query", "key", "value")], axis=1
        )
        qkv_bias = jnp.concatenate(
            [attn[nm]["bias"] for nm in ("query", "key", "value")]
        )
        proj = attn["Dense_0"]
    else:
        # dim < 128: fused qkv Dense_0, projection Dense_1
        qkv_kernel = attn["Dense_0"]["kernel"]
        qkv_bias = attn["Dense_0"]["bias"]
        proj = attn["Dense_1"]
    return {
        "ln1_scale": params["LayerNorm_0"]["scale"],
        "ln1_bias": params["LayerNorm_0"]["bias"],
        "qkv_kernel": qkv_kernel,
        "qkv_bias": qkv_bias,
        "proj_kernel": proj["kernel"],
        "proj_bias": proj["bias"],
        "ln2_scale": params["LayerNorm_1"]["scale"],
        "ln2_bias": params["LayerNorm_1"]["bias"],
        "fc1_kernel": params["Mlp_0"]["Dense_0"]["kernel"],
        "fc1_bias": params["Mlp_0"]["Dense_0"]["bias"],
        "fc2_kernel": params["Mlp_0"]["Dense_1"]["kernel"],
        "fc2_bias": params["Mlp_0"]["Dense_1"]["bias"],
    }


@pytest.mark.parametrize(
    "b,n,dim,heads,mlp_ratio",
    [
        (8, 197, 16, 2, 4.0),   # vit_som mnist clustering block
        (4, 65, 24, 3, 4.0),    # cls-like block (odd N, 3 heads)
        (3, 17, 16, 2, 2.0),    # batch not divisible by tile sizes >1
    ],
)
def test_fused_block_matches_xla(b, n, dim, heads, mlp_ratio):
    key = jax.random.key(0)
    kx, ki = jax.random.split(key)
    x = jax.random.normal(kx, (b, n, dim), jnp.float32)
    model = Block(dim, heads, mlp_ratio)
    params = model.init(ki, x)["params"]

    ref, _ = model.apply({"params": params}, x)
    fused = block_pallas.make_fused_block(dim, heads, mlp_ratio, n)
    out = jax.jit(fused)(x, _xla_block_params_to_fused(params))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_fused_block_grads_match_xla():
    b, n, dim, heads, mlp_ratio = 4, 33, 16, 2, 4.0
    key = jax.random.key(1)
    kx, ki, kc = jax.random.split(key, 3)
    x = jax.random.normal(kx, (b, n, dim), jnp.float32)
    cot = jax.random.normal(kc, (b, n, dim), jnp.float32)
    model = Block(dim, heads, mlp_ratio)
    params = model.init(ki, x)["params"]
    w = _xla_block_params_to_fused(params)
    fused = block_pallas.make_fused_block(dim, heads, mlp_ratio, n)

    def loss_ref(x, params):
        y, _ = model.apply({"params": params}, x)
        return jnp.sum(y * cot)

    def loss_fused(x, w):
        return jnp.sum(fused(x, w) * cot)

    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gw_r = _xla_block_params_to_fused(gp_r)

    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=2e-5, rtol=1e-4)
    for name in block_pallas.WEIGHT_NAMES:
        np.testing.assert_allclose(
            np.asarray(gw_f[name]), np.asarray(gw_r[name]), atol=2e-5, rtol=1e-4,
            err_msg=name,
        )
