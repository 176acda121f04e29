"""Dataset over offline pre-packed labels (tools/preprocess_cityscapes.py).

The working equivalent of the reference's intended offline-preprocessing
path (ref preprocess_cityscapes.py + utils/label_io.py, stale upstream —
SURVEY.md §2 row 5/35): training reads images plus already-packed static
shape label arrays from .npz, skipping JSON parsing, augmentation-time
polygon bookkeeping, and packing on the 1-core host.

Images are resized on the fly to the packed target scale; the packed labels
are already in (row, col) int coordinates at that scale. Photometric /flip
augmentation should run on device (ops/device_aug.py) in this mode.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import cv2
import numpy as np

from instance_segmentation_tpu.data.cityscapes import load_rgb_image
from instance_segmentation_tpu.data.dataset import DatasetBuilder
from instance_segmentation_tpu.transforms.augment import TransInfo


class PackedCityscapesDataset:
    """Pairs leftImg8bit images with pre-packed npz labels via the manifest."""

    def __init__(self, root: str, packed_dir: str, subset: str = "train"):
        with open(os.path.join(packed_dir, "manifest.json")) as f:
            manifest = json.load(f)
        self.target_size = manifest["target_size"]
        self.packed_files = sorted(manifest["files"])
        self.images_root = os.path.join(root, "leftImg8bit", subset)
        # map by the shared basename prefix <city>_<seq>_<frame>
        imgs = {}
        for dp, _, fn in os.walk(os.path.expanduser(self.images_root)):
            for f in fn:
                if f.endswith("_leftImg8bit.png") or f.endswith("_leftImg8bit.jpg"):
                    key = f.rsplit("_leftImg8bit", 1)[0]
                    imgs[key] = os.path.join(dp, f)
        self.items = []
        for p in self.packed_files:
            key = os.path.basename(p).rsplit("_gtFine_polygons", 1)[0]
            if key in imgs:
                self.items.append((imgs[key], p))

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, index: int):
        img_path, packed_path = self.items[index]
        blob = np.load(packed_path)
        h, w = int(blob["img_h"]), int(blob["img_w"])
        # prefer the pre-resized image cache (preprocess --cache_images);
        # fall back to decode+resize
        key = os.path.basename(packed_path).rsplit("_gtFine_polygons", 1)[0]
        cached = os.path.join(os.path.dirname(packed_path), key + "_img.npy")
        if os.path.exists(cached):
            img = np.load(cached)
        else:
            img = load_rgb_image(img_path)
            scale = 1.0 / self.target_size
            img = cv2.resize(img, (int(w * scale), int(h * scale)),
                             interpolation=cv2.INTER_LINEAR)
        label = ("packed", blob["polys"], blob["n_verts"], blob["cls_ids"])
        return img, label, TransInfo(img_path, (h, w))


class PackedCityscapesDatasetBuilder(DatasetBuilder):
    def get_dataset(self, packed_dir: Optional[str] = None, **kwargs):
        kwargs.pop("transforms", None)      # labels are already packed
        packed_dir = packed_dir or os.path.join(self._data_dir, "packed", self._phase)
        return PackedCityscapesDataset(self._data_dir, packed_dir,
                                       subset=self._phase)
