"""Fully-connected symmetric autoencoder (Flax).

Re-design of the reference MLP autoencoder
(``/root/reference/models/ae.py:13-66``): encoder dims
[C*H*W] + encoder_dims with the configured activation between layers (none
after the bottleneck), decoder = reversed dims with identity output
activation. Xavier-uniform weights, torch-default uniform biases
(``models/ae.py:47-49`` initializes weights only, leaving torch's default
bias init in place).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vitsom_tpu.utils.initializers import torch_default_bias, xavier_uniform


class MLPStack(nn.Module):
    """Linear stack: act (+ optional BatchNorm) between layers, none after
    the last (reference ``build_layers``, ``models/ae.py:40-60``)."""

    dims: Tuple[int, ...]  # full dims incl. input: len = n_layers + 1
    act: str = "relu"
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_layers = len(self.dims) - 1
        for i in range(n_layers):
            x = nn.Dense(
                self.dims[i + 1],
                kernel_init=xavier_uniform(),
                bias_init=torch_default_bias(self.dims[i]),
                name=f"dense_{i}",
            )(x)
            if i < n_layers - 1:
                if self.batch_norm:
                    x = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(x)
                if self.act == "relu":
                    x = nn.relu(x)
        return x


class Autoencoder(nn.Module):
    """Symmetric MLP AE; input is pre-flattened [B, C*H*W]."""

    input_dim: int
    encoder_dims: Tuple[int, ...]
    act: str = "relu"
    batch_norm: bool = False

    def setup(self):
        dims = (self.input_dim,) + tuple(self.encoder_dims)
        self.encoder = MLPStack(dims, self.act, self.batch_norm, name="encoder")
        self.decoder = MLPStack(tuple(reversed(dims)), self.act, self.batch_norm, name="decoder")

    def encode(self, x, train: bool = False):
        return self.encoder(x, train=train)

    def decode(self, z, train: bool = False):
        return self.decoder(z, train=train)

    def __call__(self, x, train: bool = False):
        z = self.encoder(x, train=train)
        return self.decoder(z, train=train)


def build_autoencoder(cfg) -> Autoencoder:
    input_dim = cfg.data.num_channels * cfg.data.input_size * cfg.data.input_size
    return Autoencoder(
        input_dim=input_dim,
        encoder_dims=tuple(cfg.ae.encoder_dims),
        act=cfg.ae.act,
        batch_norm=cfg.ae.batch_norm,
    )
