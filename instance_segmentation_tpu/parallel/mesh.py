"""Device mesh + sharding layout.

The reference's entire parallelism machinery is a thread-based single-process
DataParallel with queue-synchronized BatchNorm (ref utils/sync_batchnorm/*,
utils/utils.py:156-208 — never even wired into train.py). Here parallelism is
declarative: a jax.sharding.Mesh with two axes,

    "data"    — batch-dimension data parallelism (gradient all-reduce rides
                ICI via XLA's collectives under GSPMD),
    "spatial" — optional sharding of the image W axis for the full-resolution
                dense heads (XLA inserts halo exchanges for spatially
                partitioned convolutions automatically),

and NamedShardings over it. BatchNorm statistics are computed with global
reductions inside jit, so every BN is a cross-replica sync BN with no extra
code (SURVEY.md §2.3, §5.8).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1      # -1 => fill with all remaining devices
    spatial: int = 1

    def resolve(self, n_devices: int):
        spatial = max(1, self.spatial)
        data = self.data if self.data > 0 else n_devices // spatial
        if data * spatial != n_devices:
            raise ValueError(
                f"mesh {data}x{spatial} does not cover {n_devices} devices")
        return data, spatial


def make_mesh(spec: MeshSpec = MeshSpec(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    data, spatial = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Images [B, H, W, C]: batch over "data", W over "spatial"."""
    return NamedSharding(mesh, P("data", None, "spatial", None))


def label_sharding(mesh: Mesh) -> NamedSharding:
    """Per-image label arrays [B, ...]: batch over "data" only."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
