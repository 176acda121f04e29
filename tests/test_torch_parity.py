"""Numerical parity: converted reference (torch) weights -> identical outputs.

Builds the reference EfficientSeg in torch (from the read-only mount,
stubbing its absent torchvision dependency), converts its random-initialized
state_dict with tools/convert_torch_weights.py, and checks that this
framework's forward pass reproduces the reference outputs to float32
tolerance. This validates the entire model translation: scaling math, SAME
padding, BN constants, BiFPN wiring, head reshapes, U-Net decoder, and the
weight converter itself.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount not available")


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    import torch

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    boxes_mod.batched_nms = lambda *a, **k: torch.zeros(0, dtype=torch.long)
    ops.boxes = boxes_mod
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod


@pytest.fixture(scope="module")
def torch_model_and_outputs():
    import torch
    _stub_torchvision()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.efficient import EfficientSeg as TorchEfficientSeg

    torch.manual_seed(0)
    model = TorchEfficientSeg(num_classes=8, compound_coef=0)
    model.eval()
    x = torch.randn(1, 3, 128, 128)
    with torch.no_grad():
        kp_out, regression, classification, anchors = model(x)
    sd = {k: v.numpy() for k, v in model.state_dict().items()
          if "num_batches_tracked" not in k}
    return x.numpy(), sd, kp_out, regression.numpy(), classification.numpy(), anchors.numpy()


def test_forward_parity(torch_model_and_outputs):
    import jax
    import jax.numpy as jnp
    from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig, generate_anchors
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from convert_torch_weights import convert_state_dict

    x_np, sd, kp_out, reg_t, cls_t, anchors_t = torch_model_and_outputs

    cfg = EfficientSegConfig(num_classes=8, compound_coef=0,
                             normalize_in_model=False)
    model = EfficientSeg(cfg)
    x = jnp.asarray(np.transpose(x_np, (0, 2, 3, 1)))     # NCHW -> NHWC
    variables = jax.jit(lambda r: model.init({"params": r}, x, train=False))(
        jax.random.PRNGKey(0))
    variables = jax.device_get(variables)

    converted, n_loaded = convert_state_dict(sd, variables, 0, strict=False)
    assert n_loaded >= len(sd) - 2, f"only {n_loaded}/{len(sd)} tensors mapped"

    kp, ae, tan, reg, cls = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(converted, x)

    kp_ref = kp_out[0].numpy().transpose(0, 2, 3, 1)
    ae_ref = kp_out[1].numpy().transpose(0, 2, 3, 1)
    tan_ref = kp_out[2].numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(kp), kp_ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ae), ae_ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(tan), tan_ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(reg), reg_t, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cls), cls_t, atol=2e-4, rtol=1e-3)


def test_anchor_parity(torch_model_and_outputs):
    from instance_segmentation_tpu.models import generate_anchors
    *_, anchors_t = torch_model_and_outputs
    ours = generate_anchors(128, 128)
    np.testing.assert_allclose(ours, anchors_t[0], atol=1e-4)
