"""Checkpoint / resume for params, traces, and optimizer state.

The reference has NO model checkpointing (SURVEY §5.4 — only JSON metric
dumps and a commented-out state-dict recorder, models/sgpr.py:64-108). Here
it is a first-class subsystem: any pytree of arrays round-trips through a
single ``.npz`` file keyed by tree path, with a small manager that numbers
steps and prunes old checkpoints — enough to resume an interrupted
alternating trainer or SGHMC chain exactly.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree", "load_pytree_dict",
           "CheckpointManager"]

_SEP = "|"


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return _SEP.join(parts)


def save_pytree(path: str, tree: Any, metadata: Optional[dict] = None) -> str:
    """Write a pytree of arrays to ``path`` (.npz appended if absent)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    payload = {f"leaf{_SEP}{_path_str(p)}": np.asarray(v) for p, v in flat}
    if metadata is not None:
        payload["__metadata__"] = np.frombuffer(
            json.dumps(metadata).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)                     # atomic on POSIX
    return path


def load_pytree(path: str, template: Any):
    """Restore into the structure of ``template`` (arrays replaced, shapes
    checked). Returns (tree, metadata)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as zf:
        stored = {k: zf[k] for k in zf.files}
    metadata = None
    if "__metadata__" in stored:
        metadata = json.loads(stored.pop("__metadata__").tobytes().decode())
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, tmpl in flat:
        key = f"leaf{_SEP}{_path_str(p)}"
        if key not in stored:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = stored[key]
        tmpl_arr = np.asarray(tmpl)
        if arr.shape != tmpl_arr.shape:
            raise ValueError(f"shape mismatch for {key}: checkpoint "
                             f"{arr.shape} vs template {tmpl_arr.shape}")
        leaves.append(arr.astype(tmpl_arr.dtype))
    tree = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)
    return tree, metadata


def load_pytree_dict(path: str):
    """Rebuild a NESTED-DICT pytree from a checkpoint WITHOUT a template.

    The trainer-state case (round 5, VERDICT r4 item 4): the alternating
    trainer's bundle holds leaves whose shapes change between rounds (the
    hyper trace is 20 rows in first/last rounds, 10 in the middle), so a
    fixed template cannot describe it. All keys on the stored paths must be
    dict keys (true for every trainer/sampler state here). Returns
    (tree, metadata); (None, None) if the file does not exist.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    if not os.path.exists(path):
        return None, None
    with np.load(path) as zf:
        stored = {k: zf[k] for k in zf.files}
    metadata = None
    if "__metadata__" in stored:
        metadata = json.loads(stored.pop("__metadata__").tobytes().decode())
    tree: dict = {}
    for key, arr in stored.items():
        parts = key.split(_SEP)
        assert parts[0] == "leaf", key
        node = tree
        for p in parts[1:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree, metadata


class CheckpointManager:
    """Numbered checkpoints under a directory, keep the newest ``max_to_keep``."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        if max_to_keep < 1:
            raise ValueError("max_to_keep must be >= 1")
        self.directory = directory
        self.max_to_keep = max_to_keep
        os.makedirs(directory, exist_ok=True)

    def _step_path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:09d}.npz")

    def all_steps(self):
        steps = []
        for f in glob.glob(os.path.join(self.directory, "ckpt_*.npz")):
            m = re.search(r"ckpt_(\d+)\.npz$", f)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, step: int, tree: Any, metadata: Optional[dict] = None) -> str:
        meta = dict(metadata or {})
        meta["step"] = step
        out = save_pytree(self._step_path(step), tree, meta)
        for old in self.all_steps()[: -self.max_to_keep]:
            os.remove(self._step_path(old))
        return out

    def restore(self, template: Any, step: Optional[int] = None):
        """Returns (tree, metadata) of ``step`` (default: latest); (None,
        None) when no checkpoint exists."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None, None
        return load_pytree(self._step_path(step), template)

    def restore_dict(self, step: Optional[int] = None):
        """Template-free restore of a nested-dict checkpoint (see
        :func:`load_pytree_dict`). Returns (tree, metadata) or (None, None)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None, None
        return load_pytree_dict(self._step_path(step))
