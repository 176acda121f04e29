"""int8 inference path: param-tree identity, numerical closeness, and the
quantized conv unit math (models/layers.py _Int8Conv)."""

import jax
import jax.numpy as jnp
import numpy as np

from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig
from instance_segmentation_tpu.models.layers import ConvSame


def test_int8_conv_matches_manual_quant():
    """_Int8Conv == explicit (quantize -> int conv -> dequantize) in numpy."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 8, 8, 16)).astype(np.float32)
    conv = ConvSame(features=32, kernel_size=(3, 3), quant=True)
    v = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(conv.apply(v, jnp.asarray(x)))

    w = np.asarray(v["params"]["Conv_0"]["kernel"])
    b = np.asarray(v["params"]["Conv_0"]["bias"])
    s_w = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-8) / 127.0
    w_q = np.round(w / s_w)
    s_x = max(np.abs(x).max(), 1e-8) / 127.0
    x_q = np.clip(np.round(x / s_x), -127, 127)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x_q), jnp.asarray(w_q), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(ref) * (s_x * s_w) + b
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_int8_conv_close_to_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    fl = ConvSame(features=24, kernel_size=(3, 3))
    q = ConvSame(features=24, kernel_size=(3, 3), quant=True)
    v = fl.init(jax.random.PRNGKey(3), x)
    yf = np.asarray(fl.apply(v, x))
    yq = np.asarray(q.apply(v, x))          # same param tree by construction
    err = np.abs(yq - yf).max() / (np.abs(yf).max() + 1e-9)
    assert err < 0.03, err


def test_int8_model_forward_close_and_ckpt_compatible():
    """quant='int8' consumes the float param tree unchanged and the forward
    stays close to the float forward (random weights, eval mode)."""
    H, W = 128, 256
    x = jnp.asarray(np.random.default_rng(5).integers(
        0, 255, (1, H, W, 3), dtype=np.uint8))
    cfg_f = EfficientSegConfig(num_classes=4, compound_coef=0)
    cfg_q = EfficientSegConfig(num_classes=4, compound_coef=0, quant="int8")
    model_f, model_q = EfficientSeg(cfg_f), EfficientSeg(cfg_q)
    v = jax.jit(lambda r: model_f.init({"params": r}, x, train=False))(
        jax.random.PRNGKey(0))
    vq = jax.eval_shape(lambda r: model_q.init({"params": r}, x, train=False),
                        jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(vq))

    of = model_f.apply(v, x, train=False)
    oq = model_q.apply(v, x, train=False)
    # kp/ae/tan dense heads: bounded relative error vs float
    for a, b, name in [(of[0], oq[0], "kp"), (of[1], oq[1], "ae"),
                       (of[2], oq[2], "tan")]:
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        err = np.abs(a - b).max() / scale
        assert err < 0.15, (name, err)

    # train mode must NOT quantize (path has no VJP): grads flow
    def loss(p):
        o = model_q.apply({"params": p, "batch_stats": v["batch_stats"]},
                          x, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(1)})[0]
        return jnp.sum(o[0] ** 2)
    g = jax.grad(loss)(v["params"])
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, l: a + jnp.sum(jnp.abs(l)), g, 0.0)))
