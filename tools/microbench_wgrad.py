#!/usr/bin/env python
"""Price the s2d DoubleConv WEIGHT-grad lowerings at the real b8 cell shapes.

The round-5 b8 roofline attributed 14.1 ms/iter to DoubleConvS2D convs with
the weight-grad convs running at ~5-10% MXU (ARCHITECTURE.md table). XLA
lowers a stride-1 NHWC kernel-grad as a conv whose window is the whole
output map; at [3,3,304,256]-kernel cell shapes that tiles the MXU badly.
Candidate: express dw as kh*kw shifted einsums — each a [Cin, B*H*W] x
[B*H*W, Cout] matmul with a ~262k contraction dim, which the MXU eats.

Measures, per (stage, conv) shape at batch 8:
  xla:    d/dw of lax.conv_general_dilated (what autodiff emits today)
  einsum: kh*kw slice+einsum formulation (preferred_element_type f32)
plus the fwd conv for scale. Device wall via the force() trick.

Usage: python tools/microbench_wgrad.py [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    import jax
    if os.environ.get("ISEG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ISEG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    B = args.batch
    # (name, cell H, cell W, kernel) — the four DoubleConvS2D convs of the
    # B3 512x1024 train step (r=2 /2-stage + r=4 input stage, both on the
    # /4 cell grid; channel counts from the roofline table / unet_decoder).
    cases = [
        ("r2.conv0", 128, 256, (3, 3, 304, 256)),
        ("r2.conv1", 128, 256, (3, 3, 256, 256)),
        ("r4.conv0", 128, 256, (2, 2, 304, 256)),
        ("r4.conv1", 128, 256, (2, 2, 256, 256)),
    ]

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(jnp.ravel(leaf)[:1])

    def timeit(fn, *a):
        force(fn(*a))
        t = time.time()
        r = None
        for _ in range(args.iters):
            r = fn(*a)
        force(r)
        return (time.time() - t) / args.iters * 1e3

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)

    for name, H, W, kshape in cases:
        kh, kw, cin, cout = kshape
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, H, W, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(kshape), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((B, H, W, cout)), jnp.bfloat16)

        fwd = jax.jit(conv)

        @jax.jit
        def dw_xla(x, w, g):
            _, vjp = jax.vjp(lambda w_: conv(x, w_), w)
            return vjp(g)[0]

        @jax.jit
        def dw_einsum(x, g):
            ph_lo = (kh - 1) // 2
            pw_lo = (kw - 1) // 2
            xp = jnp.pad(x, ((0, 0), (ph_lo, kh - 1 - ph_lo),
                             (pw_lo, kw - 1 - pw_lo), (0, 0)))
            parts = []
            for a in range(kh):
                for b in range(kw):
                    xs = jax.lax.slice(
                        xp, (0, a, b, 0),
                        (xp.shape[0], a + H, b + W, xp.shape[3]))
                    parts.append(jnp.einsum(
                        "bhwi,bhwo->io", xs, g,
                        preferred_element_type=jnp.float32))
            return jnp.stack(parts).reshape(kh, kw, cin, cout)

        t_fwd = timeit(fwd, x, w)
        t_xla = timeit(dw_xla, x, w, g)
        t_es = timeit(dw_einsum, x, g)
        # exactness: beyond float-accum order both contract the same terms
        a1 = np.asarray(dw_xla(x, w, g), np.float32)
        a2 = np.asarray(dw_einsum(x, g), np.float32)
        rel = float(np.max(np.abs(a1 - a2)) / (np.max(np.abs(a1)) + 1e-9))
        gflop = 2 * kh * kw * B * H * W * cin * cout / 1e9
        print(f"{name:9s} [{kh},{kw},{cin},{cout}]  fwd {t_fwd:6.2f} ms | "
              f"dw_xla {t_xla:6.2f} ms ({gflop / t_xla / 1e3:5.1f} TF/s) | "
              f"dw_einsum {t_es:6.2f} ms ({gflop / t_es / 1e3:5.1f} TF/s) | "
              f"rel {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
