"""Round-trip test for the torchvision-resnet50 -> Flax weight loader
(reference teacher: ``/root/reference/models/deit.py:26-32``).

No torchvision in the image, so a synthetic state_dict with the CANONICAL
torchvision resnet50 names and shapes is built by hand; the loader must map
every conv/BN tensor by name with the OIHW->HWIO transpose, leave fc random,
and hard-fail on shape mismatches.
"""

import numpy as np
import pytest
import torch
from flax import traverse_util

import jax

from vitsom_tpu.models.resnet import load_torch_resnet50, resnet50, torchvision_name_map

WIDTHS = (64, 128, 256, 512)
SIZES = (3, 4, 6, 3)


def synthetic_resnet50_state_dict(seed: int = 0):
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    sd = {}

    def add_bn(name, c):
        sd[f"{name}.weight"] = t(c)
        sd[f"{name}.bias"] = t(c)
        sd[f"{name}.running_mean"] = t(c)
        sd[f"{name}.running_var"] = t(c).abs() + 0.5
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    sd["conv1.weight"] = t(64, 3, 7, 7)
    add_bn("bn1", 64)
    in_ch = 64
    for s, (w, n) in enumerate(zip(WIDTHS, SIZES), start=1):
        for i in range(n):
            pre = f"layer{s}.{i}"
            sd[f"{pre}.conv1.weight"] = t(w, in_ch, 1, 1)
            add_bn(f"{pre}.bn1", w)
            sd[f"{pre}.conv2.weight"] = t(w, w, 3, 3)
            add_bn(f"{pre}.bn2", w)
            sd[f"{pre}.conv3.weight"] = t(4 * w, w, 1, 1)
            add_bn(f"{pre}.bn3", 4 * w)
            if i == 0:
                sd[f"{pre}.downsample.0.weight"] = t(4 * w, in_ch, 1, 1)
                add_bn(f"{pre}.downsample.1", 4 * w)
            in_ch = 4 * w
    sd["fc.weight"] = t(1000, 2048)
    sd["fc.bias"] = t(1000)
    return sd


@pytest.fixture(scope="module")
def teacher_vars():
    model = resnet50(1000)
    x = np.zeros((1, 32, 32, 3), np.float32)
    return model.init(jax.random.key(0), x, train=False)


def test_name_map_is_total_over_state_dict():
    sd = synthetic_resnet50_state_dict()
    mods = {
        k.rsplit(".", 1)[0]
        for k in sd
        if not k.startswith("fc.") and not k.endswith("num_batches_tracked")
    }
    # every non-head torch module has exactly one flax destination
    assert mods == set(torchvision_name_map())


def test_round_trip_by_name(tmp_path, teacher_vars):
    sd = synthetic_resnet50_state_dict()
    pth = tmp_path / "resnet50.pth"
    torch.save(sd, pth)

    p0 = traverse_util.flatten_dict(teacher_vars["params"], sep="/")
    params, batch_stats = load_torch_resnet50(
        teacher_vars["params"], teacher_vars["batch_stats"], str(pth)
    )
    fp = traverse_util.flatten_dict(params, sep="/")
    fb = traverse_util.flatten_dict(batch_stats, sep="/")

    # spot-checks across depth, incl. a downsample branch and a late BN
    np.testing.assert_array_equal(
        np.asarray(fp["Conv_0/kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(fp["Bottleneck_3/Conv_3/kernel"]),  # layer2.0.downsample.0
        sd["layer2.0.downsample.0.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(fp["Bottleneck_15/BatchNorm_2/scale"]),  # layer4.2.bn3
        sd["layer4.2.bn3.weight"].numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(fb["Bottleneck_8/BatchNorm_1/mean"]),  # layer3.1.bn2
        sd["layer3.1.bn2.running_mean"].numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(fb["Bottleneck_0/BatchNorm_3/var"]),  # layer1.0.downsample.1
        sd["layer1.0.downsample.1.running_var"].numpy(),
    )

    # every conv kernel was overwritten; the fc head stays random
    for k, v in fp.items():
        if np.asarray(v).ndim == 4:
            assert not np.array_equal(np.asarray(v), np.asarray(p0[k])), k
    np.testing.assert_array_equal(
        np.asarray(fp["Dense_0/kernel"]), np.asarray(p0["Dense_0/kernel"])
    )


def test_shape_mismatch_raises(tmp_path, teacher_vars):
    sd = synthetic_resnet50_state_dict()
    sd["layer2.1.conv2.weight"] = torch.zeros(128, 128, 5, 5)  # wrong kernel
    pth = tmp_path / "bad.pth"
    torch.save(sd, pth)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_torch_resnet50(
            teacher_vars["params"], teacher_vars["batch_stats"], str(pth)
        )


def test_missing_module_raises(tmp_path, teacher_vars):
    sd = synthetic_resnet50_state_dict()
    del sd["layer3.2.conv1.weight"]
    pth = tmp_path / "incomplete.pth"
    torch.save(sd, pth)
    with pytest.raises(ValueError, match="no tensors for module"):
        load_torch_resnet50(
            teacher_vars["params"], teacher_vars["batch_stats"], str(pth)
        )
