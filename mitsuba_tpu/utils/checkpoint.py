"""Checkpoint/resume for long renders and optimization runs (SURVEY §5;
the reference has no native equivalent — its failure story is re-render —
but production TPU jobs need params + optimizer state + film accumulator +
RNG position restored bit-exactly).

Format: a single .npz with flattened pytree leaves plus a manifest of the
tree structure; pure numpy, no service dependencies.  Works for any pytree
of jnp/np arrays (scene params dict, optimizer state, film accumulators).
"""
from __future__ import annotations

import json

import numpy as np


def save_checkpoint(path, state):
    """state: an arbitrary pytree of arrays/scalars (e.g. dict with keys
    'params', 'opt_state', 'film', 'seed', 'spp_done')."""
    leaves = []
    spec = _treedef_to_spec(state, leaves)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(spec).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_checkpoint(path):
    """Returns the pytree with numpy leaves (convert with jnp.asarray as
    needed; shapes/dtypes are restored exactly)."""
    data = np.load(path, allow_pickle=False)
    spec = json.loads(bytes(data["__treedef__"]).decode())
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
    tree, rest = _spec_to_tree(spec, leaves)
    assert not rest, "leaf count mismatch"
    return tree


def _treedef_to_spec(tree, leaves):
    """JSON-able structural spec (dicts/lists/tuples/None/leaf markers);
    appends leaves in the same order the spec walk visits them."""
    if isinstance(tree, dict):
        return {"t": "d", "k": list(tree.keys()),
                "v": [_treedef_to_spec(tree[k], leaves) for k in tree.keys()]}
    if isinstance(tree, (list, tuple)):
        return {"t": "l" if isinstance(tree, list) else "t",
                "v": [_treedef_to_spec(v, leaves) for v in tree]}
    if tree is None:
        return {"t": "n"}
    leaves.append(tree)
    return {"t": "x"}       # leaf


def _spec_to_tree(spec, leaves):
    t = spec["t"]
    if t == "d":
        out = {}
        for k, v in zip(spec["k"], spec["v"]):
            out[k], leaves = _spec_to_tree(v, leaves)
        return out, leaves
    if t in ("l", "t"):
        vals = []
        for v in spec["v"]:
            x, leaves = _spec_to_tree(v, leaves)
            vals.append(x)
        return (vals if t == "l" else tuple(vals)), leaves
    if t == "n":
        return None, leaves
    return leaves[0], leaves[1:]
