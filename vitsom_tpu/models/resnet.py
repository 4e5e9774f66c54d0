"""ResNet (Flax) — the DeiT distillation teacher (and ResNet baseline).

The reference's teacher is torchvision ResNet-50 with IMAGENET1K_V2 weights
whose fc is replaced by a fresh random Linear, then the WHOLE model is
frozen (``/root/reference/models/deit.py:26-32``) — i.e. the distillation
target head is untrained. Two further reference quirks replicated:
- the teacher stays in train mode during distillation (Lightning puts the
  whole module in train mode), so its BatchNorm uses *batch* statistics;
- gradients never flow into it.

Zero-egress note: pretrained torchvision weights cannot be downloaded in
this environment. ``load_torch_resnet50`` maps a locally provided torch
state_dict (``resnet50.pth`` in data_dir) onto these modules; absent that,
the teacher is randomly initialized (architecture + freezing semantics
preserved; documented deviation).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides), use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if self.downsample:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides), use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    block: str = "bottleneck"  # "bottleneck" (50) | "basic" (34)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        Block = Bottleneck if self.block == "bottleneck" else BasicBlock
        features = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                strides = 2 if (stage > 0 and b == 0) else 1
                x = Block(features, strides=strides, downsample=(b == 0))(x, train=train)
            features *= 2
        x = x.mean(axis=(1, 2))  # global average pool
        return nn.Dense(self.num_classes)(x)


def resnet50(num_classes: int) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block="bottleneck", num_classes=num_classes)


def resnet34(num_classes: int) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block="basic", num_classes=num_classes)


def load_torch_resnet50(params, batch_stats, pth_path: str):
    """Best-effort mapping of a locally provided torchvision resnet50
    state_dict onto the Flax param tree (fc stays random, matching the
    reference's replaced head). Returns (params, batch_stats)."""
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    import numpy as np
    from flax import traverse_util

    flat_p = traverse_util.flatten_dict(params, sep="/")
    flat_b = traverse_util.flatten_dict(batch_stats, sep="/")

    # torch conv weight OIHW -> flax HWIO
    def conv_w(t):
        return np.transpose(t.numpy(), (2, 3, 1, 0))

    # build ordered lists of torch conv/bn names and flax keys; both trees
    # enumerate modules in identical construction order, so zip by order.
    torch_convs = [k for k in sd if k.endswith("weight") and sd[k].ndim == 4]
    flax_convs = [k for k in flat_p if k.endswith("Conv_0/kernel") or "/Conv_" in k and k.endswith("kernel")]
    flax_convs = [k for k in flat_p if k.endswith("kernel") and flat_p[k].ndim == 4]
    for tk, fk in zip(torch_convs, flax_convs):
        w = conv_w(sd[tk])
        if flat_p[fk].shape == w.shape:
            flat_p[fk] = jnp.asarray(w)

    torch_bns = sorted({k.rsplit(".", 1)[0] for k in sd if k.endswith("running_mean")})
    flax_bns = sorted({k.rsplit("/", 1)[0] for k in flat_b if k.endswith("mean")})

    def order_key(name):
        return name  # construction order == sorted order for both layouts

    for tb, fb in zip(torch_bns, flax_bns):
        flat_b[f"{fb}/mean"] = jnp.asarray(sd[f"{tb}.running_mean"].numpy())
        flat_b[f"{fb}/var"] = jnp.asarray(sd[f"{tb}.running_var"].numpy())
        pscale = fb.replace("batch_stats", "params") if False else fb
        # scale/bias live in params under the same module path
        if f"{fb}/scale" in flat_p:
            flat_p[f"{fb}/scale"] = jnp.asarray(sd[f"{tb}.weight"].numpy())
            flat_p[f"{fb}/bias"] = jnp.asarray(sd[f"{tb}.bias"].numpy())

    return (
        traverse_util.unflatten_dict(flat_p, sep="/"),
        traverse_util.unflatten_dict(flat_b, sep="/"),
    )
