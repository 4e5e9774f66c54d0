"""Weight initializers matching torch semantics used by the reference.

The reference initializes every Linear with ``xavier_uniform_`` + zero bias
(``/root/reference/models/vit.py:118-125``), the patch-embed conv with
xavier over the *flattened* (out, in*k*k) view (``models/vit.py:108-110``),
the CLS token and classifier-head weights with N(0, 0.02), and leaves torch's
default Linear bias init (uniform +-1/sqrt(fan_in)) on heads that skip
``_init_weights``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.nn.initializers import Initializer


def xavier_uniform() -> Initializer:
    """Standard Glorot uniform — exact match for torch xavier on 2-D weights
    (flax Dense kernels are (in, out); torch fans coincide)."""
    return jax.nn.initializers.xavier_uniform()


def conv_xavier_as_linear() -> Initializer:
    """Xavier-uniform treating a conv kernel (kh, kw, in, out) as a torch
    Linear of shape (out, in*kh*kw): fan_in = in*kh*kw, fan_out = out.

    This matches ``xavier_uniform_(w.view([out, -1]))`` in the reference
    (``models/vit.py:109-110``); flax's stock xavier would use
    fan_out = out*kh*kw and under-scale the patch embedding.
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, c_in, c_out = shape
        fan_in = c_in * kh * kw
        fan_out = c_out
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_or_normal(std: float = 0.02) -> Initializer:
    """N(0, std) — torch ``normal_(w, std=0.02)`` (``models/vit.py:113,277``)."""
    return jax.nn.initializers.normal(stddev=std)


def torch_linear_default_bias() -> Initializer:
    """torch Linear's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    flax passes bias shape (out,), so fan_in must be threaded via closure —
    use ``torch_default_bias(fan_in)`` instead when fan_in is known.
    """
    raise NotImplementedError("use torch_default_bias(fan_in)")


def torch_default_bias(fan_in: int) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
