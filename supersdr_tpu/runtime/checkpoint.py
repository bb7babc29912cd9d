"""Checkpoint / resume for streaming state.

The reference persists only session preferences (memories, server book,
QSO log — SURVEY.md §5 'no stream resume'). Here the *stream state itself*
(chain/PFB carries, AGC levels, NCO phase) is an explicit pytree, so long
captures can be processed resumably: checkpoint every N chunks, crash,
reload, and continue sample-exactly.

Format: a single .npz with flattened pytree leaves + a JSON tree spec.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np


def _flatten(state) -> tuple[list[np.ndarray], str]:
    leaves, treedef = jax.tree.flatten(state)
    return [np.asarray(l) for l in leaves], str(treedef)


def save_state(path: str | Path, state, meta: dict | None = None) -> None:
    """Persist any pytree of arrays (ChainState, WidebandState, …)."""
    leaves, treedef = _flatten(state)
    arrays = {f"leaf_{i}": l for i, l in enumerate(leaves)}
    arrays["_meta"] = np.frombuffer(
        json.dumps({"treedef": treedef, "n_leaves": len(leaves),
                    **(meta or {})}).encode(), dtype=np.uint8)
    np.savez(str(path), **arrays)


def load_state(path: str | Path, like):
    """Restore into the structure of `like` (a template state pytree built
    by the matching init_state). Shapes/dtypes are validated leaf-wise."""
    with np.load(str(path)) as data:
        meta = json.loads(bytes(data["_meta"]).decode())
        leaves = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    t_leaves, treedef = jax.tree.flatten(like)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template {len(t_leaves)}")
    import jax.numpy as jnp
    out = []
    for got, want in zip(leaves, t_leaves):
        want = np.asarray(want)
        if got.shape != want.shape:
            raise ValueError(f"leaf shape {got.shape} != template {want.shape}")
        out.append(jnp.asarray(got.astype(want.dtype)))
    return jax.tree.unflatten(treedef, out)


def checkpoint_meta(path: str | Path) -> dict:
    with np.load(str(path)) as data:
        return json.loads(bytes(data["_meta"]).decode())
