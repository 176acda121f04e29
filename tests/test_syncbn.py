"""Cross-replica BatchNorm: sharded-batch stats must equal global stats.

This is the one-line replacement for the reference's 625-line thread/queue
sync-BN package (ref utils/sync_batchnorm/*, SURVEY.md §2 rows 27-30): under
GSPMD, BN's batch reductions are global across the sharded batch axis, so
training statistics are identical whether the batch lives on 1 device or 8.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from instance_segmentation_tpu.models.layers import BatchNorm
from instance_segmentation_tpu.parallel.mesh import MeshSpec, make_mesh


def test_bn_stats_global_across_shards():
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return BatchNorm(name="bn")(x, train=train)

    net = Net()
    rng = np.random.default_rng(0)
    x = rng.normal(3.0, 2.0, size=(8, 4, 4, 3)).astype(np.float32)

    variables = net.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)

    def step(v, xb):
        y, mut = net.apply(v, xb, train=True, mutable=["batch_stats"])
        return y, mut["batch_stats"]

    # single-device reference
    y_ref, bs_ref = jax.jit(step)(variables, jnp.asarray(x))

    # 8-way sharded batch
    mesh = make_mesh(MeshSpec(data=8, spatial=1))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    y_sh, bs_sh = jax.jit(step)(vs, xs)

    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), atol=1e-5)
    ref_mean = np.asarray(bs_ref["bn"]["BatchNorm_0"]["mean"])
    sh_mean = np.asarray(bs_sh["bn"]["BatchNorm_0"]["mean"])
    np.testing.assert_allclose(sh_mean, ref_mean, atol=1e-6)
    # and the running mean actually moved toward the batch mean
    assert np.all(ref_mean > 0)
