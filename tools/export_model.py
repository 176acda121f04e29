#!/usr/bin/env python
"""AOT model export for serving: forward + full on-device decode -> one
serialized StableHLO artifact (jax.export), weights baked in.

The artifact is self-contained (no Python model code needed at load time):
a server deserializes it and calls it on uint8 image batches, getting back
the packed detection buffers (boxes path + polygon instances). Lowering
can target a platform different from the local one (--platform tpu on a
CPU box), which is the standard cross-compile deployment flow.

Usage:
  python tools/export_model.py --out model.shlo [--weights ckpt_dir]
      [--compound 3] --hw 512 1024 --batch 1 [--platform tpu|cpu]
      [--quant int8] [--verify]

`--verify` deserializes the artifact and checks its outputs match the live
jit on a random batch (exact).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_export(compound: int, hw, batch: int, num_classes: int,
                 quant: str = "none", weights: str | None = None,
                 platform: str | None = None, orig_hw=None):
    """Returns (jax.export.Exported, live_fn, example_input)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from instance_segmentation_tpu.models import (
        EfficientSeg, EfficientSegConfig, generate_anchors,
    )
    from instance_segmentation_tpu.ops.decode import DecodeConfig, forward_and_decode

    H, W = hw
    orig_hw = orig_hw or (2 * H, 2 * W)   # shipped config: x1/2 resize
    cfg = EfficientSegConfig(num_classes=num_classes, compound_coef=compound,
                             compute_dtype=jnp.bfloat16, quant=quant)
    model = EfficientSeg(cfg)
    rng = jax.random.PRNGKey(0)
    init_img = jnp.zeros((1, H, W, 3), jnp.uint8)
    variables = jax.jit(lambda r: model.init({"params": r}, init_img,
                                             train=False))(rng)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    if weights:
        from instance_segmentation_tpu.parallel import create_train_state
        from instance_segmentation_tpu.parallel.train_step import make_optimizer
        from instance_segmentation_tpu.utils.checkpoint import CheckpointManager
        state = create_train_state(model, rng, (1, H, W, 3),
                                   make_optimizer("Adam", 1e-4))
        state, _, _ = CheckpointManager(weights).restore_latest(state)
        params, batch_stats = state.params, state.batch_stats

    anchors = jnp.asarray(generate_anchors(
        H, W, pyramid_levels=cfg.pyramid_levels, anchor_scale=cfg.anchor_scale,
        scales=cfg.scales, ratios=cfg.ratios))
    dcfg = DecodeConfig()

    def serve(images):
        dets = forward_and_decode(
            model, {"params": params, "batch_stats": batch_stats}, images,
            anchors, orig_hw[0], orig_hw[1], float(orig_hw[0] / H), dcfg)
        # flat tuple of arrays: the artifact needs no custom pytree types
        return (dets.classes, dets.scores, dets.centers, dets.polygons,
                dets.poly_len, dets.obj_valid)

    fn = jax.jit(serve)
    spec = jax.ShapeDtypeStruct((batch, H, W, 3), jnp.uint8)
    platforms = [platform] if platform else None
    exp = jexport.export(fn, platforms=platforms)(spec)
    example = np.random.default_rng(0).integers(
        0, 255, (batch, H, W, 3), dtype=np.uint8)
    return exp, fn, example


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--weights", default=None,
                    help="checkpoint dir (latest checkpoint is baked in)")
    ap.add_argument("--compound", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--num_classes", type=int, default=8)
    ap.add_argument("--quant", default="none", choices=("none", "int8"))
    ap.add_argument("--platform", default=None,
                    help="lowering target (tpu/cpu); default: local platform")
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    import jax
    if os.environ.get("ISEG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ISEG_PLATFORM"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["ISEG_JIT_CACHE"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    exp, fn, example = build_export(
        args.compound, tuple(args.hw), args.batch, args.num_classes,
        quant=args.quant, weights=args.weights, platform=args.platform)
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out}: {len(blob) / 1e6:.1f} MB, "
          f"platforms={exp.platforms}")

    if args.verify:
        import numpy as np
        from jax import export as jexport
        with open(args.out, "rb") as f:
            rehydrated = jexport.deserialize(bytearray(f.read()))
        got = rehydrated.call(example)
        want = fn(example)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        print("verify: deserialized artifact matches the live jit exactly")


if __name__ == "__main__":
    main()
