#!/usr/bin/env python
"""SELF-CONTAINED minimal repro of the XLA SPMD backward divergence
(no repo imports — suitable as an upstream jax/XLA report).

Finding (tools/repro_spatial_bwd.py matrix, jax 0.9.0, 8-virtual-device CPU
backend): gradients of a bf16 conv + train-mode-BatchNorm composition under
a (data=4, spatial=2) mesh with the W axis sharded diverge from the
single-device run at global rel ~0.6, while the identical graph in f32 is
exact (~1e-6), and a hand-written 2-pass BN VJP in bf16 is also fine
(~6e-3, bf16 reduction noise). The trigger is the AUTODIFF backward of the
batch-stats normalization (mean/variance over (B, H, W)) in bf16 when the
spatial dim is sharded.

Usage:
    python tools/repro_spatial_min.py [--depth 2] [--dtype bf16|f32]
prints the grad rel; >0.1 = reproduced.
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--no-pool", action="store_true",
                    help="drop the pool/upsample pair from each block")
    ap.add_argument("--no-swish", action="store_true")
    ap.add_argument("--f32-stats-input", action="store_true",
                    help="convert x to f32 explicitly BEFORE the stats "
                         "reductions (instead of jnp.mean(bf16, dtype=f32))")
    args = ap.parse_args()

    os.environ.setdefault(
        "XLA_FLAGS",
        (os.environ.get("XLA_FLAGS", "") +
         " --xla_force_host_platform_device_count=8").strip())
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B, H, W, C = 4, 16, 32, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
    params = {
        f"w{i}": jnp.asarray(
            rng.normal(0, 0.1, (3, 3, C, C)).astype(np.float32))
        for i in range(args.depth)
    }

    def bn_train(x):
        # plain train-mode BN math (autodiff backward) — scale/bias omitted,
        # they are not needed to reproduce
        axes = (0, 1, 2)
        if args.f32_stats_input:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jax.lax.square(xf), axis=axes)
        else:
            mean = jnp.mean(x, axis=axes, dtype=jnp.float32)
            mean2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)), axis=axes)
        var = jnp.maximum(mean2 - jax.lax.square(mean), 0.0)
        r = jax.lax.rsqrt(var + 1e-3)
        return x * r.astype(x.dtype) - (mean * r).astype(x.dtype)

    def block(x, w):
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype)
        y = bn_train(y)
        if not args.no_swish:
            y = y * jax.nn.sigmoid(y)              # swish, plain autodiff
        if not args.no_pool:
            p = jax.lax.reduce_window(
                y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                "SAME")
            up = jnp.repeat(jnp.repeat(p, 2, axis=1), 2, axis=2)
            y = y + up[:, :y.shape[1], :y.shape[2]]
        return y

    def loss_fn(params, x):
        y = x
        for i in range(args.depth):
            y = block(y, params[f"w{i}"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    l1, g1 = grad_fn(params, x)
    l1, g1 = float(l1), jax.device_get(g1)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "spatial"))
    with mesh:
        xs = jax.device_put(x, NamedSharding(
            mesh, P("data", None, "spatial", None)))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        l8, g8 = grad_fn(ps, xs)
        l8, g8 = float(l8), jax.device_get(g8)

    num = den = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g8),
                    jax.tree_util.tree_leaves(g1)):
        a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
        num += float(np.sum((a64 - b64) ** 2))
        den += float(np.sum(b64 ** 2))
    def _rel(ga, gb):
        num = den = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gb)):
            a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
            num += float(np.sum((a64 - b64) ** 2))
            den += float(np.sum(b64 ** 2))
        return (num / max(den, 1e-30)) ** 0.5

    rel = (num / max(den, 1e-30)) ** 0.5
    lrel = abs(l8 - l1) / max(abs(l1), 1e-30)
    line = (f"depth={args.depth} dtype={args.dtype} no_pool={args.no_pool} "
            f"no_swish={args.no_swish} f32_stats={args.f32_stats_input} "
            f"loss rel = {lrel:.3e}  grad rel = {rel:.3e}")
    if args.dtype == "bf16":
        # ground truth: the same graph with f32 compute, single device.
        # If single-device bf16 is ALREADY far from it, the sharded-vs-
        # unsharded gap is bf16 cancellation noise, not a partitioner bug.
        dtype = jnp.float32
        _, gt = jax.jit(jax.value_and_grad(loss_fn))(params, x)
        line += (f"  [bf16-1dev vs f32-truth = {_rel(g1, jax.device_get(gt)):.3e}"
                 f", bf16-8dev vs f32-truth = {_rel(g8, jax.device_get(gt)):.3e}]")
    print(line, flush=True)


if __name__ == "__main__":
    main()
