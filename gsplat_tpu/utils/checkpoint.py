"""Checkpoint / resume.

The reference has no persistence beyond the read-only scene PLY
(SURVEY.md section 5); training needs atomic save/restore of the Gaussian
parameter pytree + optimizer state + step counter. Plain npz keeps the format
dependency-free and inspectable; PLY export (io/ply.py) covers viewer
interop.
"""

from __future__ import annotations

import os
import tempfile

import jax
import numpy as np


def save_checkpoint(path: str, state) -> None:
    """Atomically save a pytree (e.g. TrainState) to an .npz."""
    leaves, treedef = jax.tree.flatten(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["__treedef__"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def checkpoint_step(path: str) -> int:
    """Step counter stored in a TrainState checkpoint WITHOUT materializing
    the template. TrainState is (scene, opt_state, step) in field order, so
    the step scalar is the last leaf; asserts it looks like one."""
    with np.load(path) as data:
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        arr = data[f"leaf_{n - 1}"]
        if arr.shape != () or not np.issubdtype(arr.dtype, np.integer):
            raise ValueError(
                f"last checkpoint leaf is {arr.dtype}{arr.shape}, not a "
                "scalar int step counter -- not a TrainState checkpoint?"
            )
        return int(arr)


def load_checkpoint(path: str, like):
    """Restore into the structure of `like` (shape/dtype template)."""
    with np.load(path) as data:
        leaves, treedef = jax.tree.flatten(like)
        restored = []
        for i, leaf in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            want = np.asarray(leaf)
            if arr.shape != want.shape:
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != expected {want.shape}"
                )
            restored.append(arr.astype(want.dtype))
        return jax.tree.unflatten(treedef, restored)
