"""Async checkpoint save/resume.

Capability parity with the reference's checkpointing (ref train.py:80-152:
{'state_dict', 'epoch', 'best_ap'} dicts, filenames
efficient_weights_{epoch:0>8}.pth / ..._{epoch:0>4}_{iter:0>4}.pth, async
3-worker thread pool, resume from the lexicographically-latest file,
non-strict load). Implemented with orbax's async checkpointer over the flax
pytree state — multi-host/sharded-array safe, unlike torch.save.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_NAME_RE = re.compile(r"^efficient_weights_(\d{8})$|^efficient_weights_(\d{4})_(\d{4})$")


def _ckpt_name(epoch: int, iter_id: Optional[int] = None) -> str:
    if iter_id is None:
        return f"efficient_weights_{epoch:08d}"
    return f"efficient_weights_{epoch:04d}_{iter_id:04d}"


class CheckpointManager:
    """Async orbax checkpointing of {state, epoch, best_ap}."""

    def __init__(self, save_dir: str):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, state: Any, epoch: int, best_ap: float,
             iter_id: Optional[int] = None) -> str:
        path = os.path.join(self.save_dir, _ckpt_name(epoch if epoch >= 0 else 0, iter_id))
        payload = {
            "state": jax.device_get(_savable(state)),
            "meta": {"epoch": np.array(epoch, np.int32),
                     "best_ap": np.array(best_ap, np.float32)},
        }
        self._ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
        return path

    def wait(self):
        self._ckptr.wait_until_finished()

    def list_checkpoints(self):
        """Checkpoint names in TRAINING order (oldest first).

        Epoch saves (8-digit) and mid-epoch iter saves (4+4-digit) interleave;
        plain lexicographic order would rank every iter save after every
        epoch save ('0007_0999' > '00000007'), so a resume would silently
        discard the end-of-epoch state. Sort by (epoch, iter) with the
        end-of-epoch save ranked after any iter save of the same epoch.
        """
        out = []
        if not os.path.isdir(self.save_dir):
            return out
        for name in os.listdir(self.save_dir):
            if _NAME_RE.match(name) and os.path.isdir(os.path.join(self.save_dir, name)):
                out.append(name)

        def key(name):
            m = _NAME_RE.match(name)
            if m.group(1) is not None:                  # epoch save
                return (int(m.group(1)), float("inf"))
            return (int(m.group(2)), int(m.group(3)))   # iter save
        return sorted(out, key=key)

    def restore_latest(self, state_template: Any) -> Tuple[Any, int, float]:
        """Restore the latest checkpoint into the template's structure.

        Returns (state, start_epoch, best_ap); (template, 0, 0.0) when no
        checkpoint exists (ref load_state_dict train.py:119-152).
        """
        names = self.list_checkpoints()
        if not names:
            return state_template, 0, 0.0
        return self.restore_named(names[-1], state_template)

    def restore_named(self, name: str, state_template: Any) -> Tuple[Any, int, float]:
        path = os.path.join(self.save_dir, name)
        template = {
            "state": jax.device_get(_savable(state_template)),
            "meta": {"epoch": np.array(0, np.int32),
                     "best_ap": np.array(0.0, np.float32)},
        }
        ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
        payload = ckptr.restore(path, args=ocp.args.StandardRestore(template))
        state = _load_into(state_template, payload["state"])
        epoch = int(payload["meta"]["epoch"])
        best_ap = float(payload["meta"]["best_ap"])
        return state, epoch + 1, best_ap


def load_pretrained(path: str, state: Any) -> Tuple[Any, int, int]:
    """Non-strict warm start from a converted `{params, batch_stats}` orbax
    checkpoint (tools/convert_torch_weights.py output).

    Mirrors the reference's `load_state_dict(..., strict=False)` pretrained
    branch (ref train.py:119-132, models/efficientnet/utils.py:299-313):
    every leaf whose path AND shape match the fresh state is taken from the
    checkpoint (backbone-only subsets work); everything else keeps its fresh
    initialization. Returns (state, n_matched, n_total_ckpt_leaves).
    """
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    loaded = ckptr.restore(os.path.abspath(path))
    fresh = {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)}

    counts = {"matched": 0, "total": 0}

    def merge(dst, src):
        if not isinstance(src, dict):
            counts["total"] += 1
            if dst is not None and not isinstance(dst, dict) \
                    and tuple(np.shape(dst)) == tuple(np.shape(src)):
                counts["matched"] += 1
                return np.asarray(src).astype(np.asarray(dst).dtype)
            return dst
        if not isinstance(dst, dict):
            # structure mismatch: count the subtree as unmatched
            counts["total"] += sum(1 for _ in jax.tree.leaves(src))
            return dst
        out = dict(dst)
        for k, v in src.items():
            if k in dst:
                out[k] = merge(dst[k], v)
            else:
                counts["total"] += sum(1 for _ in jax.tree.leaves(v))
        return out

    merged = {k: merge(fresh.get(k, {}), loaded.get(k, {}))
              for k in ("params", "batch_stats")}
    state = state.replace(params=merged["params"],
                          batch_stats=merged["batch_stats"])
    return state, counts["matched"], counts["total"]


def _savable(state: Any):
    """Strip non-pytree fields (the optax transformation) from TrainState."""
    return {"step": state.step, "params": state.params,
            "batch_stats": state.batch_stats, "opt_state": state.opt_state}


def _load_into(template: Any, loaded: dict):
    return template.replace(step=loaded["step"], params=loaded["params"],
                            batch_stats=loaded["batch_stats"],
                            opt_state=loaded["opt_state"])
