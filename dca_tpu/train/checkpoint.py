"""Full-train-state checkpointing (SURVEY.md §5.4).

The reference can only save best-val WEIGHTS (train.py:64-69) and cannot
resume: optimizer state and epoch counter are lost.  Here the complete train
state — params, BN state, optimizer accumulators, callback bookkeeping, RNG
seed, epoch — round-trips through a single checkpoint, enabling true
crash-resume for long multi-host runs.

Storage: orbax when importable, else a flat .npz + JSON sidecar (same API).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(leaf):
    # mesh-sharded leaves need a collective gather (every process runs it)
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from ..parallel.multihost import gather_to_host

        return gather_to_host(leaf)
    return np.asarray(leaf)


def _flatten(tree, prefix=""):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = prefix + "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out[key] = _to_numpy(leaf)
    return out, treedef


class TrainCheckpoint:
    """Checkpoint of the full training state."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def save(
        self,
        step: int,
        params,
        state,
        opt_state,
        *,
        lr: float,
        callback_state: Optional[Dict[str, Any]] = None,
        seed: Optional[int] = None,
    ):
        tree = {"params": params, "state": state, "opt_state": opt_state}
        flat, _ = _flatten(tree)  # collective gathers: all processes run this
        path = os.path.join(self.directory, f"ckpt_{step}.npz")
        if jax.process_index() != 0:
            return path  # rank 0 owns the files
        meta = {
            "step": step,
            "lr": lr,
            "seed": seed,
            "callback_state": callback_state or {},
        }
        # json sidecar FIRST, then the npz whose presence names the step:
        # a crash between the two leaves no discoverable half-checkpoint
        # (restore() also falls back a step on a missing/corrupt sidecar)
        jpath = os.path.join(self.directory, f"ckpt_{step}.json")
        jtmp = jpath + ".tmp"
        with open(jtmp, "w") as f:
            json.dump(meta, f)
        os.replace(jtmp, jpath)
        tmp = path + ".tmp.npz"
        np.savez(tmp, **flat)
        os.replace(tmp, path)
        self._gc(keep=2)
        return path

    def _steps(self):
        steps = []
        for f in os.listdir(self.directory):
            if f.startswith("ckpt_") and f.endswith(".npz"):
                try:
                    steps.append(int(f[len("ckpt_") : -len(".npz")]))
                except ValueError:
                    pass
        return sorted(steps)

    def _gc(self, keep=2):
        for s in self._steps()[:-keep]:
            for ext in (".npz", ".json"):
                try:
                    os.remove(os.path.join(self.directory, f"ckpt_{s}{ext}"))
                except OSError:
                    pass

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None

    def restore(self, template_tree, step: Optional[int] = None):
        """Restore into the structure of ``template_tree`` (a dict with
        params/state/opt_state of the right shapes). Returns
        (tree, meta) or (None, None) when no usable checkpoint exists.
        A step whose npz/json pair is incomplete or corrupt (crash mid-save)
        is skipped in favor of the previous one."""
        if step is not None:
            candidates = [step]
        else:
            candidates = list(reversed(self._steps()))
        for s in candidates:
            try:
                return self._restore_step(template_tree, s)
            except (OSError, KeyError, ValueError, json.JSONDecodeError):
                continue  # half-written pair: fall back to the previous step
        return None, None

    def _restore_step(self, template_tree, step):
        data = np.load(os.path.join(self.directory, f"ckpt_{step}.npz"))
        flat, treedef = jax.tree_util.tree_flatten_with_path(template_tree)
        leaves = []
        for path, leaf in flat:
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            arr = data[key]
            leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
        tree = jax.tree_util.tree_unflatten(treedef, leaves)
        with open(os.path.join(self.directory, f"ckpt_{step}.json")) as f:
            meta = json.load(f)
        return tree, meta
