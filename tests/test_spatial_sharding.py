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
