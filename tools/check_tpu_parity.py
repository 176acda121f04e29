#!/usr/bin/env python
"""CPU-vs-TPU numerical parity check of every compiled surface.

The oracle/parity test suite runs on CPU; nothing there catches an XLA:TPU
MISCOMPILE (wrong results produced only by the accelerator backend). One
was found live: the single-fusion form of the s2d shift-add depthwise
produced 95%-wrong outputs on TPU for channel counts < ~96 while every CPU
test stayed green (models/s2d.py s2d_depthwise_shift docstring). This tool
is the regression net: it runs the real surfaces on BOTH backends in f32
at HIGHEST matmul precision and compares.

Surfaces:
  - eval forward, standard and packed s2d head layouts
  - decode_output AND decode_output_packed on synthetic QUANTIZED head maps
    (values on a 1/64 grid so backend 1-ulp noise cannot flip score
    comparisons: with random-weight model outputs, near-tie top-k/NMS
    ordering differs legitimately between backends and drowns the signal).
    Also asserts packed == standard bit-exactly ON the TPU itself.
  - the train step's loss stats, gradients (global-scale normalized: conv
    biases feeding BN have analytically-zero gradients whose noise Adam
    would amplify into +/-lr param diffs) and updated batch stats
  - --shift-sweep: s2d_depthwise_shift fwd+grad vs CPU across channel
    counts {8..144} x r {2,4} x k {3,5} x stride {1,2}

Run on a host with a real TPU attached (the default backend must not be
cpu). Small shapes (B0 at 128x256) keep compiles quick and sit squarely in
the lane-padding zone where the known miscompile class triggers.

Usage: python tools/check_tpu_parity.py [--shift-sweep] [--rel 3e-3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["ISEG_JIT_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

FAILED = []


def _leaves(tree):
    return [(jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(tree)
            if hasattr(v, "dtype")]


def compare(name: str, cpu_tree, tpu_tree, rel_tol: float,
            global_scale: bool = False) -> None:
    """Per-leaf max-abs-err vs the CPU magnitude; int/bool exact.

    global_scale=True normalizes every leaf's error by the max magnitude of
    the WHOLE cpu tree (for gradient trees, where individual leaves can be
    pure cancellation noise)."""
    worst = (0.0, "")
    n_int_bad = 0
    gs = 0.0
    if global_scale:
        for _, c in _leaves(cpu_tree):
            c = np.asarray(c)
            if c.dtype.kind == "f" and c.size:
                gs = max(gs, float(np.abs(c).max()))
    for (path, c), (_, t) in zip(_leaves(cpu_tree), _leaves(tpu_tree)):
        c, t = np.asarray(c), np.asarray(t)
        if c.dtype.kind in "biu":
            bad = int((c != t).sum())
            n_int_bad += bad
            if bad:
                worst = max(worst, (1.0, f"{path} int mismatches={bad}"))
            continue
        err = float(np.abs(c.astype(np.float64) - t.astype(np.float64)).max()
                    ) if c.size else 0.0
        scale = (gs if global_scale else float(np.abs(c).max())) + 1e-6
        r = err / scale
        if r > worst[0]:
            worst = (r, f"{path} abs={err:.3e} scale={scale:.3e}")
    ok = worst[0] <= rel_tol and n_int_bad == 0
    print(f"{'PASS' if ok else 'FAIL':4s} {name:34s} worst rel "
          f"{worst[0]:.2e}  {worst[1]}")
    if not ok:
        FAILED.append(name)


def _put(tree, dev):
    return jax.tree.map(lambda a: jax.device_put(a, dev), tree)


def compare_dets(name: str, c, t, rel_tol: float) -> None:
    """Cross-backend Detections comparison. Box decode runs exp/log whose
    1-ulp backend differences can flip AFFINITY-GROUPING near-ties for
    points ambiguous between overlapping (random) instances, legitimately
    changing a polygon's membership set. Scores/classes/validity/boxes must
    match strictly; polygon slots get a small mismatch budget (a real
    miscompile garbles nearly every slot — see the s2d shift-add incident)."""
    strict_bad = []
    for field in ("scores", "classes", "det_valid"):
        a, b = np.asarray(getattr(c, field)), np.asarray(getattr(t, field))
        n = int((a != b).sum()) if a.dtype.kind in "biu" else int(
            (np.abs(a - b) > rel_tol * (np.abs(a).max() + 1e-6)).sum())
        if n:
            strict_bad.append(f"{field}={n}")
    for field in ("boxes", "centers"):
        a, b = np.asarray(getattr(c, field)), np.asarray(getattr(t, field))
        err = float(np.abs(a - b).max())
        if err > 0.01:  # px
            strict_bad.append(f"{field} err={err:.3f}px")
    pl_c, pl_t = np.asarray(c.poly_len), np.asarray(t.poly_len)
    ov_c, ov_t = np.asarray(c.obj_valid), np.asarray(t.obj_valid)
    B, D = pl_c.shape
    bad_slots = 0
    for bi in range(B):
        for di in range(D):
            if pl_c[bi, di] != pl_t[bi, di] or ov_c[bi, di] != ov_t[bi, di]:
                bad_slots += 1
                continue
            n = pl_c[bi, di]
            if n and float(np.abs(np.asarray(c.polygons)[bi, di, :n]
                                  - np.asarray(t.polygons)[bi, di, :n]).max()
                           ) > 0.51:
                bad_slots += 1
    budget = max(1, (B * D) // 5)
    ok = not strict_bad and bad_slots <= budget
    print(f"{'PASS' if ok else 'FAIL':4s} {name:34s} "
          f"strict[{', '.join(strict_bad) or 'ok'}] "
          f"polygon slots differing {bad_slots}/{B * D} (budget {budget})")
    if not ok:
        FAILED.append(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shift-sweep", action="store_true")
    ap.add_argument("--rel", type=float, default=3e-3)
    ap.add_argument("--hw", type=int, nargs=2, default=(128, 256))
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--compound", type=int, default=0)
    args = ap.parse_args()

    if jax.default_backend() == "cpu":
        print("default backend is cpu — nothing to compare against",
              file=sys.stderr)
        return 2
    cpu = jax.devices("cpu")[0]
    acc = jax.devices()[0]
    print(f"comparing cpu vs {acc.platform} ({acc})")

    if args.shift_sweep:
        shift_sweep(cpu, args.rel)
        return 1 if FAILED else 0

    from instance_segmentation_tpu.losses import LossConfig
    from instance_segmentation_tpu.models import (
        EfficientSeg, EfficientSegConfig, generate_anchors)
    from instance_segmentation_tpu.ops.decode import (
        DecodeConfig, decode_output, decode_output_packed)
    from instance_segmentation_tpu.parallel import create_train_state
    from instance_segmentation_tpu.parallel.train_step import make_optimizer

    H, W = args.hw
    B, M, P = args.batch, 8, 128
    cfg = EfficientSegConfig(num_classes=8, compound_coef=args.compound,
                             compute_dtype=jnp.float32)
    model = EfficientSeg(cfg)
    anchors = jnp.asarray(generate_anchors(
        H, W, pyramid_levels=cfg.pyramid_levels, anchor_scale=cfg.anchor_scale,
        scales=cfg.scales, ratios=cfg.ratios))
    # decode thresholds loose enough that random weights produce activity
    dcfg = DecodeConfig(cls_th=0.02, kp_th=512, pre_nms=64, max_dets=8,
                        max_poly=128)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8)
    polys = np.zeros((B, M, 8, 2), np.float32)
    n_verts = np.zeros((B, M), np.int32)
    cls_ids = np.full((B, M), -1, np.int32)
    for b in range(B):
        for m in range(4):
            cy, cx = rng.uniform(30, H - 30), rng.uniform(40, W - 40)
            rh, rw = rng.uniform(10, 24), rng.uniform(12, 34)
            ang = np.linspace(0, 2 * np.pi, 9)[:-1]
            polys[b, m] = np.stack([cy + rh * np.sin(ang),
                                    cx + rw * np.cos(ang)], -1)
            n_verts[b, m] = 8
            cls_ids[b, m] = rng.integers(0, 8)
        polys[b, 4:] = polys[b, 0, 0]

    tx = make_optimizer("Adam", 2e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, H, W, 3), tx)

    def fwd_std(p, s, x):
        return model.apply({"params": p, "batch_stats": s}, x, train=False)

    def fwd_packed(p, s, x):
        return model.apply({"params": p, "batch_stats": s}, x, train=False,
                           packed_heads=True)

    fwd_args = (state.params, state.batch_stats, jnp.asarray(images))
    results = {}
    for name, fn in [("eval fwd standard", fwd_std),
                     ("eval fwd packed", fwd_packed)]:
        for backend, dev in (("cpu", cpu), (acc.platform, acc)):
            out = jax.jit(fn, backend=backend)(*_put(fwd_args, dev))
            results[(name, backend)] = jax.device_get(out)
        compare(name, results[(name, "cpu")], results[(name, acc.platform)],
                args.rel)

    # --- decode on synthetic QUANTIZED maps (tie-free by construction) ---
    from instance_segmentation_tpu.models.s2d import space_to_depth

    def q(a, grid=64.0):
        return np.round(a * grid) / grid

    n_anchors = int(anchors.shape[0])
    kp = jnp.asarray(q(rng.normal(size=(B, H, W, 1)) + 1.5), jnp.float32)
    ae = jnp.asarray(q(rng.normal(size=(B, H, W, 4)) * 8), jnp.float32)
    tan = jnp.asarray(q(rng.normal(size=(B, H, W, 2))), jnp.float32)
    reg = jnp.asarray(q(rng.normal(size=(B, n_anchors, 4)) * 0.1, 256),
                      jnp.float32)
    cls = jnp.asarray(q(rng.uniform(0.001, 0.999, (B, n_anchors, 8)), 256),
                      jnp.float32)
    packed_maps = space_to_depth(jnp.concatenate([kp, ae, tan], -1), 4)

    def dec_std(kp, ae, tan, reg, cls):
        return decode_output((kp, ae, tan, reg, cls), anchors, H, W, 1.0,
                             dcfg)

    def dec_packed(kpf, pm, reg, cls):
        return decode_output_packed((kpf, pm, reg, cls), anchors, H, W, 1.0,
                                    dcfg)

    dec_res = {}
    for name, fn, a in [("decode standard", dec_std, (kp, ae, tan, reg, cls)),
                        ("decode packed", dec_packed,
                         (kp[..., 0], packed_maps, reg, cls))]:
        for backend, dev in (("cpu", cpu), (acc.platform, acc)):
            dec_res[(name, backend)] = jax.device_get(
                jax.jit(fn, backend=backend)(*_put(a, dev)))
        compare_dets(name, dec_res[(name, "cpu")],
                     dec_res[(name, acc.platform)], args.rel)
    # the packed layout must be EXACTLY the standard decode on one device —
    # no tie tolerance here (the gather is pure integer index math)
    compare("decode packed==std on-device",
            dec_res[("decode standard", acc.platform)],
            dec_res[("decode packed", acc.platform)], args.rel)
    n_det = int(np.asarray(
        dec_res[("decode packed", "cpu")].det_valid).sum())
    n_obj = int(np.asarray(
        dec_res[("decode packed", "cpu")].obj_valid).sum())
    print(f"     decode activity: {n_det} valid dets, {n_obj} polygons "
          f"(must be > 0 for the decode rows to mean anything)")
    if n_det == 0:
        FAILED.append("decode produced zero detections (vacuous)")

    # --- train step: loss stats + grads + new batch stats ---
    from instance_segmentation_tpu.losses.losses import compose_loss
    from instance_segmentation_tpu.ops.targets import generate_targets

    def make_loss_grads(lcfg):
        def loss_grads(params, bstats, x, po, nv, ci):
            tg = generate_targets(po, nv, ci, H, W, max_points=P,
                                  dense_kp=False)

            def loss_fn(p):
                outputs, mutated = model.apply(
                    {"params": p, "batch_stats": bstats}, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(7)},
                    mutable=["batch_stats"])
                total, stats = compose_loss(outputs, tg, anchors, lcfg)
                return total, (stats, mutated["batch_stats"])

            (total, (stats, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return total, stats, grads, new_bs
        return loss_grads

    batch = (state.params, state.batch_stats, jnp.asarray(images),
             jnp.asarray(polys), jnp.asarray(n_verts), jnp.asarray(cls_ids))
    # strict: the SAME dense AE lowering on both backends (apples to apples)
    dense = make_loss_grads(LossConfig(ae_impl="dense"))
    outs = {}
    for backend, dev in (("cpu", cpu), (acc.platform, acc)):
        outs[backend] = jax.device_get(
            jax.jit(dense, backend=backend)(*_put(batch, dev)))
    compare("train loss+stats (dense ae)", outs["cpu"][:2],
            outs[acc.platform][:2], args.rel)
    # grad tolerance 2e-2: cross-backend f32 reassociation noise COMPOUNDS
    # through the backprop chain (measured: trivial-loss grads already
    # differ 1.3e-3 global-rel at the stem, the deepest leaf, while the
    # loss value and the AE-map grad alone are stable to ~1e-5; the CPU
    # f32-vs-f64 noise floor of the AE grad is 7e-6). A miscompile of the
    # class this tool hunts (s2d shift-add: 95% of elements wrong) sits
    # orders of magnitude above this.
    compare("train grads (dense ae)", outs["cpu"][2],
            outs[acc.platform][2], max(args.rel, 2e-2), global_scale=True)
    compare("train batch stats", outs["cpu"][3], outs[acc.platform][3],
            args.rel, global_scale=True)
    # loose: the production auto path (Pallas AE on TPU) vs dense CPU — a
    # formulation difference, expected within ~3e-2 of the global grad scale
    auto = jax.device_get(jax.jit(make_loss_grads(LossConfig()),
                                  backend=acc.platform)(*batch))
    compare("train grads (pallas vs dense)", outs["cpu"][2], auto[2],
            max(args.rel, 3e-2), global_scale=True)

    print("FAILED:" if FAILED else "ALL PASS",
          ", ".join(FAILED) if FAILED else "")
    return 1 if FAILED else 0


def shift_sweep(cpu, rel_tol):
    from instance_segmentation_tpu.models.s2d import s2d_depthwise_shift
    rng = np.random.default_rng(1)
    acc = jax.devices()[0]
    for (E, R, stride, k) in [(8, 2, 1, 3), (24, 2, 1, 3), (32, 2, 1, 3),
                              (40, 2, 1, 3), (96, 2, 1, 3), (144, 2, 1, 3),
                              (24, 2, 2, 3), (32, 2, 2, 3), (144, 2, 2, 3),
                              (16, 4, 1, 5), (24, 2, 1, 5), (40, 2, 2, 5)]:
        B, Hc, Wc = 2, 16, 24
        x = jnp.asarray(rng.normal(size=(B, Hc, Wc, E * R * R)), jnp.float32)
        kd = jnp.asarray(rng.normal(size=(k, k, 1, E)), jnp.float32)
        cot = jnp.asarray(
            rng.normal(size=(B, Hc, Wc, E * (R // stride) ** 2)), jnp.float32)

        def fg(a, w):
            out = s2d_depthwise_shift(a, w, R, stride=stride)
            return out, jax.grad(
                lambda z, v: jnp.sum(
                    s2d_depthwise_shift(z, v, R, stride=stride) * cot),
                argnums=(0, 1))(a, w)

        rc = jax.device_get(jax.jit(fg, backend="cpu")(
            *_put((x, kd), cpu)))
        rt = jax.device_get(jax.jit(fg, backend=acc.platform)(x, kd))
        compare(f"shift E={E} r={R} s={stride} k={k}", rc, rt, rel_tol)


if __name__ == "__main__":
    sys.exit(main())
