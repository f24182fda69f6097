"""Numerical parity of flax models with torch layer semantics and with the
reference's from-scratch Swin (used as a behavioral oracle, never as source).

torch (CPU) is available in this image; torchvision is not, so ResNet parity is
checked layer-wise against hand-built torch modules replicating torchvision's
documented structure.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pets_face_recognition_tpu.models.resnet import Bottleneck, resnet18  # noqa: E402
from pets_face_recognition_tpu.models.swin import swin_t  # noqa: E402
from pets_face_recognition_tpu.utils.torch_convert import (  # noqa: E402
    convert_resnet,
    convert_swin,
    state_dict_to_numpy,
)

REF_SWIN = Path("/root/reference/models/swin.py")


def test_conv_bn_maxpool_stem_matches_torch(rng):
    """The ResNet stem: conv7x7/2 p3 + BN + relu + maxpool3x3/2 p1."""
    x = rng.randn(2, 3, 32, 32).astype(np.float32)

    conv = torch.nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
    bn = torch.nn.BatchNorm2d(8, eps=1e-5).eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.randn(8) * 0.1)
        bn.running_var.copy_(torch.rand(8) + 0.5)
        out_t = torch.nn.functional.max_pool2d(
            torch.relu(bn(conv(torch.from_numpy(x)))), 3, stride=2, padding=1
        ).numpy()

    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, name="conv")(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             name="bn")(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])

    params = {
        "conv": {"kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0)},
        "bn": {"scale": bn.weight.detach().numpy(),
               "bias": bn.bias.detach().numpy()},
    }
    stats = {"bn": {"mean": bn.running_mean.numpy(),
                    "var": bn.running_var.numpy()}}
    out_j = Stem().apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=2e-5
    )


class TorchBottleneck(torch.nn.Module):
    """torchvision Bottleneck structure (stride on 3x3, expansion 4)."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        out = planes * 4
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                     bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inplanes != out:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(inplanes, out, 1, stride=stride, bias=False),
                torch.nn.BatchNorm2d(out),
            )

    def forward(self, x):
        identity = x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            identity = self.downsample(x)
        return torch.relu(y + identity)


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.randn(m.num_features).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    rng.rand(m.num_features).astype(np.float32) + 0.5))


def test_bottleneck_matches_torchvision_structure(rng):
    block_t = TorchBottleneck(16, 8, stride=2).eval()
    _randomize_bn_stats(block_t, rng)
    x = rng.randn(2, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = block_t(torch.from_numpy(x)).numpy()

    sd = state_dict_to_numpy(block_t.state_dict())
    sd = {f"layer1.0.{k}": v for k, v in sd.items()}
    sd["conv1.weight"] = rng.randn(8, 3, 7, 7).astype(np.float32)  # unused stem
    sd.update({
        "bn1.weight": np.ones(8, np.float32), "bn1.bias": np.zeros(8, np.float32),
        "bn1.running_mean": np.zeros(8, np.float32),
        "bn1.running_var": np.ones(8, np.float32),
    })
    params, stats = convert_resnet(sd)

    import flax.linen as nn
    from functools import partial
    block_j = Bottleneck(8, stride=2, norm=partial(
        nn.BatchNorm, use_running_average=True, epsilon=1e-5))
    out_j = block_j.apply(
        {"params": params["layer1_0"], "batch_stats": stats["layer1_0"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), want, atol=2e-4
    )


@pytest.mark.skipif(not REF_SWIN.exists(), reason="reference not mounted")
def test_swin_t_matches_reference_oracle(rng):
    """Full-model parity: converted reference Swin-T weights produce the same
    logits (the reference implementation is executed as a black-box oracle)."""
    spec = importlib.util.spec_from_file_location("ref_swin", REF_SWIN)
    ref = importlib.util.module_from_spec(spec)
    sys.modules["ref_swin"] = ref
    spec.loader.exec_module(ref)

    model_t = ref.swin_t(num_classes=5, window_size=4,
                         downscaling_factors=(2, 2, 2, 2)).eval()
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = model_t(torch.from_numpy(x)).numpy()

    params = convert_swin(state_dict_to_numpy(model_t.state_dict()))
    model_j = swin_t(num_classes=5, window_size=4,
                     downscaling_factors=(2, 2, 2, 2))
    out = model_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-3)


def test_resnet18_forward_shapes(rng):
    model = resnet18(num_classes=10)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 10)

    pyramid_model = resnet18(features_only=True)
    feats = pyramid_model.apply(pyramid_model.init(jax.random.PRNGKey(0), x), x)
    assert set(feats) == {"c2", "c3", "c4", "c5"}
    assert feats["c2"].shape == (1, 16, 16, 64)
    assert feats["c5"].shape == (1, 2, 2, 512)
