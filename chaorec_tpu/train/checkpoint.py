"""Checkpoint/resume for training runs (capability add — the reference
has no checkpointing at all; a crashed grid run restarts from scratch).

Uses orbax-checkpoint when available (async-safe, multi-host aware — the
right primitive for TPU pods), with a plain ``np.savez`` fallback so the
feature degrades gracefully. Checkpoints hold the full training state:
params, optimizer state, model state (stateful models), the epoch RNG and
the early-stopping cursor; ``best_metrics`` travels in a JSON sidecar
(nested int-keyed metric dicts are not an array pytree).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointManager:
    """Step-indexed checkpoints under ``directory`` (one subdir per step)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        try:
            import orbax.checkpoint as ocp

            self._ocp = ocp
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep),
            )
        except Exception:  # orbax unavailable/incompatible -> npz fallback
            self._ocp = None
            self._mgr = None

    # ------------------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [
            int(d.split("_")[1]) for d in os.listdir(self.directory)
            if d.startswith("step_")
        ]
        return max(steps) if steps else None

    def save(self, step: int, tree: Dict[str, Any],
             metrics: Optional[Dict] = None) -> None:
        if self._mgr is not None:
            self._mgr.save(step, args=self._ocp.args.StandardSave(
                _to_numpy(tree)))
            self._mgr.wait_until_finished()
            meta_dir = os.path.join(self.directory, str(step))
        else:
            meta_dir = os.path.join(self.directory, f"step_{step}")
            os.makedirs(meta_dir, exist_ok=True)
            flat, treedef = jax.tree_util.tree_flatten(_to_numpy(tree))
            np.savez(os.path.join(meta_dir, "state.npz"),
                     **{f"leaf_{i}": leaf for i, leaf in enumerate(flat)})
            self._gc()
        if metrics is not None:
            os.makedirs(meta_dir, exist_ok=True)
            with open(os.path.join(meta_dir, "metrics.json"), "w") as f:
                json.dump(metrics, f)

    def restore(self, step: int, like: Dict[str, Any]
                ) -> Tuple[Dict[str, Any], Optional[Dict]]:
        if self._mgr is not None:
            tree = self._mgr.restore(
                step, args=self._ocp.args.StandardRestore(_to_numpy(like)))
            meta_dir = os.path.join(self.directory, str(step))
        else:
            meta_dir = os.path.join(self.directory, f"step_{step}")
            data = np.load(os.path.join(meta_dir, "state.npz"))
            flat, treedef = jax.tree_util.tree_flatten(like)
            leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
            tree = jax.tree_util.tree_unflatten(treedef, leaves)
        metrics = None
        mpath = os.path.join(meta_dir, "metrics.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                metrics = json.load(f)
        return tree, metrics

    def _gc(self) -> None:
        import shutil

        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(self.directory)
            if d.startswith("step_")
        )
        for s in steps[:-self.max_to_keep]:
            shutil.rmtree(os.path.join(self.directory, f"step_{s}"),
                          ignore_errors=True)
