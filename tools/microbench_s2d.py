#!/usr/bin/env python
"""Microbench the s2d backbone primitives vs their standard forms (TPU).

Isolates which s2d primitive regressed the backbone block
(tools/profile_blocks.py --backbone-s2d: 71.5 -> 160.9 ms fwd+bwd b4):
  - pointwise: full-res 1x1 conv  vs  phase_pointwise einsum  vs  kron-dense
  - depthwise: full-res k3 depthwise  vs  grouped s2d cell conv
Shapes = B3 stage-1 (/2 res 256x512, C=24/expanded 144) at batch 4.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
import jax

if os.environ.get("ISEG_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["ISEG_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from instance_segmentation_tpu.models.s2d import (
    phase_pointwise, s2d_depthwise_kernel, space_to_depth)

B, H, W = 4, 256, 512
C, E = 24, 144
R = 2
DT = jnp.bfloat16


def timed(name, fn, *args, iters=30):
    f = jax.jit(fn)
    r = f(*args)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[:1])
    t = time.time()
    for _ in range(iters):
        r = f(*args)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[:1])
    dt = (time.time() - t) / iters * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), DT)
    xe = jnp.asarray(rng.normal(size=(B, H, W, E)), DT)
    xc = space_to_depth(x, R)            # [B, H/2, W/2, C*4]
    xec = space_to_depth(xe, R)          # [B, H/2, W/2, E*4]
    k1 = jnp.asarray(rng.normal(size=(1, 1, C, E)), jnp.float32)
    kd = jnp.asarray(rng.normal(size=(3, 3, 1, E)), jnp.float32)

    def conv(x, k, fgc=1, pad="SAME"):
        return jax.lax.conv_general_dilated(
            x, k.astype(DT), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=fgc, preferred_element_type=DT)

    # --- pointwise expand C->E ---
    timed("pointwise full-res 1x1", lambda a: conv(a, k1), x)
    timed("pointwise phase einsum (s2d)", lambda a: phase_pointwise(a, k1, R, dtype=DT), xc)
    # kron-dense: block kernel [C*r2, E*r2] = W (x) I
    kk = jnp.einsum("cd,pq->cpdq", k1[0, 0], jnp.eye(R * R, dtype=jnp.float32))
    kk = kk.reshape(1, 1, C * R * R, E * R * R)
    timed("pointwise kron-dense 1x1 (s2d)", lambda a: conv(a, kk), xc)
    # grouped by phase needs phase-major; emulate cost with fgc=r2 tiled kernel
    ktile = jnp.tile(k1, (1, 1, 1, R * R))        # [1,1,C, E*4]
    timed("pointwise grouped fgc=4 (phase-major)",
          lambda a: conv(a, ktile, fgc=R * R), xc)

    # --- depthwise k3 on expanded E ---
    timed("depthwise full-res k3", lambda a: conv(a, kd, fgc=E), xe)
    w, pad = s2d_depthwise_kernel(kd, R, 1)
    timed("depthwise grouped cell conv (s2d)",
          lambda a: jax.lax.conv_general_dilated(
              a, w.astype(DT), (1, 1), pad,
              dimension_numbers=("NHWC", "HWIO", "NHWC"),
              feature_group_count=E, preferred_element_type=DT), xec)

    # fwd+bwd variants of the two main suspects
    def fb(fn):
        def g(a):
            return jnp.sum(fn(a) ** 2)
        return jax.grad(g)
    timed("fwd+bwd pointwise full-res", fb(lambda a: conv(a, k1)), x)
    timed("fwd+bwd pointwise phase einsum", fb(lambda a: phase_pointwise(a, k1, R, dtype=DT)), xc)
    timed("fwd+bwd pointwise kron-dense", fb(lambda a: conv(a, kk)), xc)
    timed("fwd+bwd depthwise full-res", fb(lambda a: conv(a, kd, fgc=E)), xe)
    timed("fwd+bwd depthwise grouped cell",
          fb(lambda a: jax.lax.conv_general_dilated(
              a, w.astype(DT), (1, 1), pad,
              dimension_numbers=("NHWC", "HWIO", "NHWC"),
              feature_group_count=E, preferred_element_type=DT)), xec)




def main_alt():
    """Alternatives for the depthwise cell conv (the measured regression)."""
    rng = np.random.default_rng(0)
    from instance_segmentation_tpu.models.s2d import depth_to_space
    xe = jnp.asarray(rng.normal(size=(B, H, W, E)), DT)
    xec = space_to_depth(xe, R)
    kd = jnp.asarray(rng.normal(size=(3, 3, 1, E)), jnp.float32)
    w, pad = s2d_depthwise_kernel(kd, R, 1)      # [kc,kc, r2, E*r2], fgc=E

    # (h) dense block-diagonal cell kernel [kc,kc, E*r2, E*r2]
    kc_y, kc_x, r2, er2 = w.shape
    dense = np.zeros((kc_y, kc_x, E * r2, er2), np.float32)
    wn = np.asarray(w)
    for c in range(E):
        dense[:, :, c * r2:(c + 1) * r2, c * r2:(c + 1) * r2] = \
            wn[:, :, :, c * r2:(c + 1) * r2]
    dense = jnp.asarray(dense)

    def cellconv_dense(a):
        return jax.lax.conv_general_dilated(
            a, dense.astype(DT), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=DT)

    # (c) d2s -> full-res depthwise -> s2d
    def roundtrip(a):
        f = depth_to_space(a, R)
        f = jax.lax.conv_general_dilated(
            f, kd.astype(DT), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=E, preferred_element_type=DT)
        return space_to_depth(f, R)

    def fb(fn):
        def g(a):
            return jnp.sum(fn(a) ** 2)
        return jax.grad(g)

    timed("depthwise dense blockdiag cell conv", cellconv_dense, xec)
    timed("depthwise d2s/full-res/s2d roundtrip", roundtrip, xec)
    timed("fwd+bwd dense blockdiag cell conv", fb(cellconv_dense), xec)
    timed("fwd+bwd d2s/full-res/s2d roundtrip", fb(roundtrip), xec)


def main_chain():
    """Whole expand -> depthwise -> project chain at stage-1 shapes: the
    transposes around the depthwise are what the roundtrip pays; candidates
    move the layout change into the 1x1 matmuls or into shifted adds."""
    rng = np.random.default_rng(0)
    from instance_segmentation_tpu.models.s2d import depth_to_space
    Hc, Wc = H // R, W // R
    xc = jnp.asarray(rng.normal(size=(B, Hc, Wc, C * R * R)), DT)
    k1 = jnp.asarray(rng.normal(size=(1, 1, C, E)), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(1, 1, E, C)), jnp.float32)
    kd = jnp.asarray(rng.normal(size=(3, 3, 1, E)), jnp.float32)

    def dconv(x):
        return jax.lax.conv_general_dilated(
            x, kd.astype(DT), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=E, preferred_element_type=DT)

    # A: current MBConvS2D form (einsums on s2d; d2s/s2d around the conv)
    def chain_a(a):
        y = phase_pointwise(a, k1, R, dtype=DT)
        f = depth_to_space(y, R)
        f = dconv(f)
        y = space_to_depth(f, R)
        return phase_pointwise(y, k2, R, dtype=DT)

    # B: layout folded into the matmuls — expand emits full-res directly,
    # project consumes full-res directly (no standalone transpose pass)
    def chain_b(a):
        xr = a.reshape(B, Hc, Wc, C, R, R)
        f = jnp.einsum("bhwcyx,cd->bhywxd", xr.astype(DT), k1.astype(DT)[0, 0],
                       preferred_element_type=DT)
        f = f.reshape(B, H, W, E)
        f = dconv(f)
        fr = f.reshape(B, Hc, R, Wc, R, E)
        y = jnp.einsum("bhywxe,ec->bhwcyx", fr, k2.astype(DT)[0, 0],
                       preferred_element_type=DT)
        return y.reshape(B, Hc, Wc, C * R * R)

    # C: depthwise as 36 shifted multiply-adds directly on the s2d tensor
    def dconv_shift(y):                       # y: [B,Hc,Wc,E*4]
        xr = y.reshape(B, Hc, Wc, E, R, R)
        xp = jnp.pad(xr, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
        kdt = kd.astype(DT)
        phases = []
        for py in range(R):
            for px in range(R):
                acc = None
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        sy, cy = (py + dy) % R, (py + dy) // R
                        sx, cx = (px + dx) % R, (px + dx) // R
                        src = xp[:, 1 + cy:1 + cy + Hc, 1 + cx:1 + cx + Wc,
                                 :, sy, sx]
                        t = kdt[dy + 1, dx + 1, 0, :] * src
                        acc = t if acc is None else acc + t
                phases.append(acc)
        out = jnp.stack(phases, axis=-1)      # [B,Hc,Wc,E,4] phase-minor
        return out.reshape(B, Hc, Wc, E * R * R)

    def chain_c(a):
        y = phase_pointwise(a, k1, R, dtype=DT)
        y = dconv_shift(y)
        return phase_pointwise(y, k2, R, dtype=DT)

    # D: same shifted multiply-adds, f32 accumulation (numerics of the conv)
    def dconv_shift_f32(y):
        xr = y.reshape(B, Hc, Wc, E, R, R)
        xp = jnp.pad(xr, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
        phases = []
        for py in range(R):
            for px in range(R):
                acc = None
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        sy, cy = (py + dy) % R, (py + dy) // R
                        sx, cx = (px + dx) % R, (px + dx) // R
                        src = xp[:, 1 + cy:1 + cy + Hc, 1 + cx:1 + cx + Wc,
                                 :, sy, sx]
                        t = kd[dy + 1, dx + 1, 0, :] * src.astype(jnp.float32)
                        acc = t if acc is None else acc + t
                phases.append(acc.astype(DT))
        out = jnp.stack(phases, axis=-1)
        return out.reshape(B, Hc, Wc, E * R * R)

    def chain_d(a):
        y = phase_pointwise(a, k1, R, dtype=DT)
        y = dconv_shift_f32(y)
        return phase_pointwise(y, k2, R, dtype=DT)

    def fb(fn):
        def g(a):
            return jnp.sum(fn(a) ** 2)
        return jax.grad(g)

    for name, fn in (("A current (einsum+roundtrip)", chain_a),
                     ("B layout-folded matmuls", chain_b),
                     ("C shift-add s2d depthwise", chain_c),
                     ("D shift-add f32 accum", chain_d)):
        ra, rb = np.asarray(chain_a(xc), np.float32), None
        rb = np.asarray(fn(xc), np.float32)
        err = float(np.max(np.abs(ra - rb)) / (np.abs(ra).max() + 1e-6))
        timed(f"chain {name} fwd", fn, xc)
        timed(f"chain {name} fwd+bwd", fb(fn), xc)
        print(f"{'':42s}  max rel err vs A: {err:.2e}")


def main_stride2():
    """The stride-2 transition depthwise (stage-2 entry: s2d(2) cells in,
    dense /4 out): d2s + full-res grouped stride-2 conv (current) vs the
    strided shift-add form (9 multiply-adds, no transpose at all)."""
    rng = np.random.default_rng(0)
    from instance_segmentation_tpu.models.s2d import (
        depth_to_space, s2d_depthwise_shift)
    Hc, Wc = H // R, W // R
    xec = jnp.asarray(rng.normal(size=(B, Hc, Wc, E * R * R)), DT)
    kd = jnp.asarray(rng.normal(size=(3, 3, 1, E)), jnp.float32)

    def roundtrip(a):
        f = depth_to_space(a, R)
        return jax.lax.conv_general_dilated(
            f, kd.astype(DT), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=E, preferred_element_type=DT)

    def shift(a):
        return s2d_depthwise_shift(a, kd, R, stride=2, dtype=DT)

    def fb(fn):
        def f(a):
            return jax.grad(lambda z: jnp.sum(fn(z).astype(jnp.float32)))(a)
        return f

    ra = np.asarray(jax.jit(roundtrip)(xec), np.float32)
    rb = np.asarray(jax.jit(shift)(xec), np.float32)
    err = float(np.max(np.abs(ra - rb)) / (np.abs(ra).max() + 1e-6))
    timed("s2 dw roundtrip fwd", roundtrip, xec)
    timed("s2 dw roundtrip fwd+bwd", fb(roundtrip), xec)
    timed("s2 dw shift-add fwd", shift, xec)
    timed("s2 dw shift-add fwd+bwd", fb(shift), xec)
    print(f"{'':42s}  max rel err: {err:.2e}")


if __name__ == "__main__":
    if "--alt" in sys.argv:
        main_alt()
        raise SystemExit
    if "--chain" in sys.argv:
        main_chain()
        raise SystemExit
    if "--stride2" in sys.argv:
        main_stride2()
        raise SystemExit
    main()
