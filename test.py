#!/usr/bin/env python
"""Inference entry point: python test.py --cfg_path configs/test_cfg.yaml

Capability parity with ref test.py: run the model + decode over an image
directory (or a single image), draw instance masks onto the originals, and
write them to save_dir (ref test.py:97-149).
"""

import argparse
import os



def _platform_override():
    """Honour ISEG_PLATFORM=cpu|tpu (the axon plugin ignores JAX_PLATFORMS)."""
    import os
    plat = os.environ.get("ISEG_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    cache = os.environ.get("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

def main():
    _platform_override()
    parser = argparse.ArgumentParser(description="test")
    parser.add_argument("--cfg_path", dest="cfg_path", type=str, required=True)
    args = parser.parse_args()

    from instance_segmentation_tpu.configs import Config, load_decode_config, load_trans_config
    cfg = Config(args.cfg_path)
    data_cfg = cfg.data
    decode_cfg = load_decode_config(cfg.get("decode_cfg_path"))
    trans_cfg = load_trans_config(cfg.get("trans_cfg_path"))
    os.makedirs(data_cfg.save_dir, exist_ok=True)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instance_segmentation_tpu import data as data_mod
    from instance_segmentation_tpu.evaluation.eval_loop import decode_cfg_from, detections_to_json
    from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig, generate_anchors
    from instance_segmentation_tpu.ops.decode import forward_and_decode
    from instance_segmentation_tpu.parallel import create_train_state
    from instance_segmentation_tpu.parallel.train_step import make_optimizer
    from instance_segmentation_tpu.transforms import CommonTransforms
    from instance_segmentation_tpu.utils.checkpoint import CheckpointManager
    from instance_segmentation_tpu.utils.logger import Logger
    from instance_segmentation_tpu.utils.visualize import visualize_instances

    logger = Logger.init_logger(data_cfg.save_dir, run_config=cfg)

    num_classes = data_cfg.num_classes
    tpu_cfg = cfg.get("tpu")
    model_cfg = EfficientSegConfig(num_classes=num_classes,
                                   compound_coef=cfg.compound_coef,
                                   compute_dtype=jnp.bfloat16,
                                   quant=(tpu_cfg.get("quant") or "none")
                                   if tpu_cfg else "none")
    model = EfficientSeg(model_cfg)

    input_hw = (512, 1024)
    if "input_size" in data_cfg:
        from instance_segmentation_tpu.configs import parse_anchor_expr
        input_hw = tuple(parse_anchor_expr(data_cfg.input_size)) \
            if isinstance(data_cfg.input_size, str) else tuple(data_cfg.input_size)

    state = create_train_state(model, jax.random.PRNGKey(cfg.seed),
                               (1, *input_hw, 3), make_optimizer())
    # Load the EXACT named checkpoint when weights_path is given (ref
    # test.py:85-94 loads the named file strict); only fall back to
    # restore_latest when no path is configured.
    weights_path = cfg.get("weights_path")
    if weights_path:
        weights_path = weights_path.rstrip("/")
        mgr = CheckpointManager(os.path.dirname(weights_path))
        name = os.path.basename(weights_path)
        if name not in mgr.list_checkpoints():
            raise FileNotFoundError(
                f"weights_path {weights_path!r} is not a checkpoint "
                f"(available: {mgr.list_checkpoints()})")
        state, _, _ = mgr.restore_named(name, state)
    else:
        mgr = CheckpointManager(data_cfg.save_dir)
        state, _, _ = mgr.restore_latest(state)

    eval_tf = CommonTransforms(trans_cfg, "val")
    test_image = data_cfg.get("test_image")
    if test_image:
        from instance_segmentation_tpu.data.cityscapes import load_rgb_image
        imgs = [(load_rgb_image(test_image), test_image)]
    else:
        loader = data_mod.get_dataloader(
            data_cfg.batch_size, "dir", data_cfg.test_dir, phase="test",
            transforms=eval_tf, with_label=False)
        imgs = None

    h, w = input_hw
    mc = model.cfg
    anchors = jnp.asarray(generate_anchors(
        h, w, pyramid_levels=mc.pyramid_levels, anchor_scale=mc.anchor_scale,
        scales=mc.scales, ratios=mc.ratios))
    dcfg = decode_cfg_from(decode_cfg)
    scale = trans_cfg.get("val_trans", "resize", default={}).get("target_size", 1)
    orig_hw = (h * scale, w * scale)

    @jax.jit
    def infer(params, batch_stats, images):
        return forward_and_decode(
            model, {"params": params, "batch_stats": batch_stats}, images,
            anchors, orig_hw[0], orig_hw[1], float(scale), dcfg)

    draw_flag = bool(decode_cfg.get("draw_flag"))

    batch_size = int(data_cfg.get("batch_size") or 1)

    def handle(images_np, infos):
        if images_np.shape[0] < batch_size:
            # pad the final partial batch to the fixed shape (one compile)
            pad = np.zeros((batch_size - images_np.shape[0],
                            *images_np.shape[1:]), images_np.dtype)
            images_np = np.concatenate([images_np, pad], axis=0)
        dets = infer(state.params, state.batch_stats, images_np)
        det_lists = detections_to_json(dets, infos)
        for i, (det_list, info) in enumerate(zip(det_lists, infos)):
            img = cv2.imread(info.img_path)
            polys = [np.asarray(d[3], np.float32) for d in det_list]
            img = visualize_instances(img, polys)
            out = os.path.join(data_cfg.save_dir, os.path.basename(info.img_path))
            cv2.imwrite(out, img)
            logger.write(f"wrote {out} ({len(det_list)} instances)")
            if draw_flag:
                from instance_segmentation_tpu.utils.debug_draw import dump_detections
                dump_detections(dets, i, info.img_path, data_cfg.save_dir)

    if imgs is not None:
        from instance_segmentation_tpu.transforms import TransInfo
        for raw, path in imgs:
            timg, _, info = eval_tf(raw, img_path=path)
            handle(np.stack([timg]), [info])
    else:
        for images, _, infos in loader:
            handle(images, infos)


if __name__ == "__main__":
    main()
