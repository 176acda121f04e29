"""Spatial sharding of the dense heads (SURVEY.md §2.3's analog of sequence
parallelism): the image W axis sharded across devices must produce the same
forward outputs as unsharded execution — XLA inserts the conv halo exchanges
under GSPMD."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig
from instance_segmentation_tpu.parallel.mesh import MeshSpec, make_mesh


def test_spatial_sharded_forward_matches_unsharded():
    H, W = 128, 256
    cfg = EfficientSegConfig(num_classes=4, compound_coef=0)
    model = EfficientSeg(cfg)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (1, H, W, 3), dtype=np.uint8)

    variables = jax.jit(lambda r: model.init(
        {"params": r}, jnp.zeros((1, H, W, 3), jnp.uint8), train=False)
    )(jax.random.PRNGKey(0))

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    ref = fwd(variables, jnp.asarray(x))

    mesh = make_mesh(MeshSpec(data=1, spatial=8))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "spatial", None)))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    out = fwd(vs, xs)

    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=2e-4, rtol=1e-3)


def test_spatial_sharded_backward_exact_in_f32():
    """Round-5 regression for the 'spatial-sharding backward divergence':
    the root cause was bf16 BN-autodiff cancellation noise, NOT the SPMD
    partitioner (tools/repro_spatial_min.py; ARCHITECTURE.md round-5 note).
    This pins the case that WOULD indict the partitioner if it ever broke:
    conv -> train-mode BN -> swish chains in f32 must be backward-exact
    under a W-sharded mesh (bf16 reduction noise excluded by construction).
    """
    from instance_segmentation_tpu.models.bifpn import BiFPNCell
    import flax.linen as nn
    from jax.sharding import Mesh

    B, C = 4, 8
    shapes = [(B, 2 ** (5 - i), 2 ** (6 - i), C) for i in range(5)]
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(0, 1, s).astype(np.float32))
             for s in shapes]

    class TwoCells(nn.Module):
        @nn.compact
        def __call__(self, feats, train=True):
            for i in range(2):
                feats = BiFPNCell(num_channels=C, conv_channels=[],
                                  first_time=False, attention=False,
                                  dtype=jnp.float32,
                                  name=f"cell{i}")(feats, train=train)
            return feats

    net = TwoCells()
    variables = net.init({"params": jax.random.PRNGKey(0)}, feats,
                         train=False)

    def loss_fn(params, bs, feats):
        outs, _ = net.apply({"params": params, "batch_stats": bs}, feats,
                            train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o ** 2) for o in outs)

    grad_fn = jax.jit(jax.grad(loss_fn))
    g1 = grad_fn(variables["params"], variables.get("batch_stats", {}), feats)

    mesh = make_mesh(MeshSpec(data=4, spatial=2))
    fs = [jax.device_put(np.asarray(f), NamedSharding(
        mesh, P("data", None, "spatial", None))) for f in feats]
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    g8 = grad_fn(vs["params"], vs.get("batch_stats", {}), fs)

    num = den = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g8),
                    jax.tree_util.tree_leaves(g1)):
        a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
        num += float(np.sum((a64 - b64) ** 2))
        den += float(np.sum(b64 ** 2))
    rel = (num / max(den, 1e-30)) ** 0.5
    assert rel < 1e-4, f"f32 spatial-sharded backward diverged: rel={rel:.2e}"
