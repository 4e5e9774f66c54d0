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


def torchvision_name_map(
    stage_sizes: Sequence[int] = (3, 4, 6, 3), block: str = "bottleneck"
) -> dict:
    """Explicit torchvision-module-name -> Flax-scope-path map.

    Flax auto-names submodules in construction order inside each scope:
    ResNet.__call__ creates ``Conv_0``/``BatchNorm_0`` (stem), then one
    ``Bottleneck_i`` per residual block ACROSS all stages, then ``Dense_0``;
    each Bottleneck creates ``Conv_0..2``/``BatchNorm_0..2`` and — when it
    downsamples — ``Conv_3``/``BatchNorm_3``. torchvision names the same
    modules ``conv1``/``bn1``, ``layer{s}.{i}.conv{1..3}``/``bn{1..3}`` and
    ``layer{s}.{i}.downsample.{0,1}``. The map is BY NAME, never by
    enumeration order (order-zipped mappings silently mis-assign when either
    side changes iteration order)."""
    n_convs = 3 if block == "bottleneck" else 2
    blk_name = "Bottleneck" if block == "bottleneck" else "BasicBlock"
    m = {"conv1": "Conv_0", "bn1": "BatchNorm_0"}
    blk = 0
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for i in range(n_blocks):
            t, f = f"layer{stage}.{i}", f"{blk_name}_{blk}"
            for j in range(1, n_convs + 1):
                m[f"{t}.conv{j}"] = f"{f}/Conv_{j - 1}"
                m[f"{t}.bn{j}"] = f"{f}/BatchNorm_{j - 1}"
            # first block of each stage downsamples (ResNet.__call__)
            if i == 0:
                m[f"{t}.downsample.0"] = f"{f}/Conv_{n_convs}"
                m[f"{t}.downsample.1"] = f"{f}/BatchNorm_{n_convs}"
            blk += 1
    return m


def load_torch_resnet50(
    params,
    batch_stats,
    pth_path: str,
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    block: str = "bottleneck",
):
    """Map a locally provided torchvision resnet state_dict onto the Flax
    trees BY NAME with strict shape checks. ``fc`` stays random, matching the
    reference's replaced-and-frozen head (``/root/reference/models/deit.py:28-32``).
    Raises ValueError on any shape mismatch or unconsumed conv/BN tensor.
    Returns (params, batch_stats)."""
    import numpy as np
    import torch
    from flax import traverse_util

    sd = torch.load(pth_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    flat_p = dict(traverse_util.flatten_dict(params, sep="/"))
    flat_b = dict(traverse_util.flatten_dict(batch_stats, sep="/"))
    name_map = torchvision_name_map(stage_sizes, block)

    def assign(tree, key, value):
        if key not in tree:
            raise ValueError(f"flax tree is missing expected key {key!r}")
        if tuple(tree[key].shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {key!r}: flax {tuple(tree[key].shape)} "
                f"vs torch {tuple(value.shape)}"
            )
        tree[key] = jnp.asarray(value)

    consumed = set()
    for tmod, fmod in name_map.items():
        if f"{tmod}.running_mean" in sd:  # BatchNorm module
            assign(flat_b, f"{fmod}/mean", sd[f"{tmod}.running_mean"].numpy())
            assign(flat_b, f"{fmod}/var", sd[f"{tmod}.running_var"].numpy())
            assign(flat_p, f"{fmod}/scale", sd[f"{tmod}.weight"].numpy())
            assign(flat_p, f"{fmod}/bias", sd[f"{tmod}.bias"].numpy())
            consumed |= {
                f"{tmod}.{s}"
                for s in ("running_mean", "running_var", "weight", "bias")
            }
        elif f"{tmod}.weight" in sd:  # Conv module: torch OIHW -> flax HWIO
            w = np.transpose(sd[f"{tmod}.weight"].numpy(), (2, 3, 1, 0))
            assign(flat_p, f"{fmod}/kernel", w)
            consumed.add(f"{tmod}.weight")
        else:
            raise ValueError(f"state_dict has no tensors for module {tmod!r}")

    leftover = [
        k
        for k in sd
        if k not in consumed
        and not k.startswith("fc.")  # head intentionally stays random
        and not k.endswith("num_batches_tracked")
    ]
    if leftover:
        raise ValueError(f"unconsumed state_dict tensors: {leftover[:8]}")

    return (
        traverse_util.unflatten_dict(flat_p, sep="/"),
        traverse_util.unflatten_dict(flat_b, sep="/"),
    )
