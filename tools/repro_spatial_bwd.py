#!/usr/bin/env python
"""Bisect harness for the spatial-sharding backward divergence (round 4).

Round-4 finding (ARCHITECTURE.md "Spatial-sharding backward divergence"):
TWO chained BiFPN cells produce gradients at global rel ~0.4 under a
data4 x spatial2 mesh vs a single device, while every primitive and a single
cell are backward-exact. This script reproduces that and strips suspects:

  variants:
    default      -- repo cells as shipped (custom BN VJP + custom swish VJP)
    bn_autodiff  -- ISEG_BN_AUTODIFF=1 (plain-XLA BN backward)
    no_cvjp      -- ISEG_BN_AUTODIFF=1 + ISEG_SWISH_AUTODIFF=1
                    (NO first-party custom VJPs anywhere in the graph)
    pinned       -- no_cvjp + with_sharding_constraint(batch-only) on every
                    intermediate pyramid level inside the cells' inputs

Run on the 8-virtual-device CPU backend:
    python tools/repro_spatial_bwd.py [--variant all]

If `no_cvjp` still diverges, the bug is in the XLA SPMD partitioner's
backward partitioning of the plain conv/BN/pool/upsample composition
(jax 0.9.0), and the minimal upstream repro is this script with the repo
imports inlined.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(name: str) -> float:
    os.environ.pop("ISEG_BN_AUTODIFF", None)
    os.environ.pop("ISEG_SWISH_AUTODIFF", None)
    if name in ("bn_autodiff", "no_cvjp", "pinned", "no_cvjp_bf16",
                "bn_only_bf16"):
        os.environ["ISEG_BN_AUTODIFF"] = "1"
    if name in ("no_cvjp", "pinned", "no_cvjp_bf16", "swish_only_bf16"):
        os.environ["ISEG_SWISH_AUTODIFF"] = "1"

    import jax
    import jax.numpy as jnp
    import numpy as np
    import flax.linen as nn
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from instance_segmentation_tpu.models.bifpn import BiFPNCell

    B, C = 4, 16
    shapes = [(B, 2 ** (6 - i), 2 ** (7 - i), C) for i in range(5)]  # P3..P7
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(0, 1, s).astype(np.float32))
             for s in shapes]

    pin = name == "pinned"
    dtype = (jnp.bfloat16 if name in ("bf16", "attention_bf16", "no_cvjp_bf16",
                                      "bn_only_bf16", "swish_only_bf16")
             else jnp.float32)
    attention = name in ("attention", "attention_bf16")

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "spatial"))

    class TwoCells(nn.Module):
        @nn.compact
        def __call__(self, feats, train=True):
            for i in range(2):
                feats = BiFPNCell(num_channels=C, conv_channels=[],
                                  first_time=False, attention=attention,
                                  dtype=dtype,
                                  name=f"cell{i}")(feats, train=train)
                if pin:
                    feats = [jax.lax.with_sharding_constraint(
                        f, NamedSharding(mesh, P("data", None, None, None)))
                        for f in feats]
            return feats

    net = TwoCells()
    variables = net.init({"params": jax.random.PRNGKey(0)}, feats, train=False)

    def loss_fn(params, bs, feats):
        outs, _ = net.apply({"params": params, "batch_stats": bs}, feats,
                            train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    grad_fn = jax.jit(jax.grad(loss_fn))

    g1 = jax.device_get(grad_fn(variables["params"],
                                variables.get("batch_stats", {}), feats))

    with mesh:
        fs = [jax.device_put(f, NamedSharding(
            mesh, P("data", None, "spatial", None))) for f in feats]
        vs = jax.device_put(variables, NamedSharding(mesh, P()))
        g8 = jax.device_get(grad_fn(vs["params"],
                                    vs.get("batch_stats", {}), fs))

    num = den = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g8),
                    jax.tree_util.tree_leaves(g1)):
        a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
        num += float(np.sum((a64 - b64) ** 2))
        den += float(np.sum(b64 ** 2))
    rel = (num / max(den, 1e-30)) ** 0.5
    print(f"variant {name:12s} grad rel = {rel:.3e}", flush=True)
    return rel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="all",
                    choices=["all", "default", "bn_autodiff", "no_cvjp",
                             "pinned", "bf16", "attention", "attention_bf16",
                             "no_cvjp_bf16", "bn_only_bf16",
                             "swish_only_bf16"])
    args = ap.parse_args()

    os.environ.setdefault(
        "XLA_FLAGS",
        (os.environ.get("XLA_FLAGS", "") +
         " --xla_force_host_platform_device_count=8").strip())
    import jax
    jax.config.update("jax_platforms", "cpu")

    names = (["default", "bf16", "attention", "attention_bf16",
              "no_cvjp_bf16", "bn_autodiff", "no_cvjp", "pinned"]
             if args.variant == "all" else [args.variant])
    for n in names:
        # each variant retraces (env flags are trace-time), same process ok
        run_variant(n)


if __name__ == "__main__":
    main()
