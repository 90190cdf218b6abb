"""DSP state checkpoint/resume (SURVEY §5.4).

The reference persists only configuration; PLL phases and filter tails are
lost on restart (``core/src/config.cpp``).  Here the entire streaming
state is an explicit pytree, so checkpointing is trivial: flatten to
arrays, save as ``.npz`` with the treedef recorded, restore exactly.

Works on realified states (host-safe; complex leaves arrive as CplxPair),
so a receiver can be snapshotted mid-stream and resumed bit-exactly.
"""

from __future__ import annotations

import json

import numpy as np
import jax


def save_state(path: str, state) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    # write through a file handle: np.savez(str) silently appends ".npz"
    # to bare paths, which load_state (np.load on the verbatim path)
    # would then not find
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_state(path: str, like) -> object:
    """Restore a state saved with `save_state`; ``like`` provides the
    treedef (e.g. ``op.init_state()`` or a realified version of it)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    n_saved = sum(1 for k in data.files if k.startswith("leaf_"))
    saved_def = bytes(data["__treedef__"]).decode()
    if n_saved != n or saved_def != str(treedef):
        raise ValueError(
            "checkpoint treedef mismatch — was the chain reconfigured?"
        )
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
