"""SceneParameters / traverse — the differentiable-parameter view.

TPU-native equivalent of mi.traverse()/SceneParameters
(reference: src/python/python/util.py:13-355, Object::traverse callbacks).
Because the scene is an immutable pytree, `update()` returns a *new* scene;
`params.scene` always holds the latest version.  Derived quantities are
recomputed by each component's `parameters_changed` analog inside update()
(e.g. size-distribution re-normalization, reference: sizedistr.h:106-108).
"""
from __future__ import annotations

import jax.numpy as jnp


def _tree_get(obj, path):
    for step in path:
        if isinstance(step, tuple) and step and step[0] == "slice":
            obj = obj[step[1]:step[2]]
        elif isinstance(step, int):
            obj = obj[step]
        else:
            obj = getattr(obj, step)
    return obj


def _tree_set(obj, path, value):
    """Functional deep-set along an attr/index path.  A step of the form
    ('slice', start, stop) writes a row range of an array leaf (used for
    per-shape vertex_positions views into the shared vertex buffer)."""
    step = path[0]
    if len(path) == 1:
        if isinstance(step, tuple) and step and step[0] == "slice":
            return obj.at[step[1]:step[2]].set(value)
        if isinstance(step, int):
            lst = list(obj)
            lst[step] = value
            return tuple(lst)
        return obj.replace(**{step: value})
    if isinstance(step, int):
        lst = list(obj)
        lst[step] = _tree_set(obj[step], path[1:], value)
        return tuple(lst)
    return obj.replace(**{step: _tree_set(getattr(obj, step), path[1:], value)})


class SceneParameters:
    """Dict-like view over the scene's differentiable parameters.

    Mirrors the reference's SceneParameters: __getitem__/__setitem__ +
    update() which applies pending writes and re-runs dependent recomputation
    (reference: util.py:185-233)."""

    def __init__(self, scene):
        self._scene = scene
        self._paths = dict(scene.param_paths)
        self._pending = {}

    @property
    def scene(self):
        return self._scene

    def keys(self):
        return self._paths.keys()

    def items(self):
        return [(k, self[k]) for k in self.keys()]

    def __contains__(self, key):
        return key in self._paths

    def __iter__(self):
        return iter(self._paths)

    def __len__(self):
        return len(self._paths)

    def __getitem__(self, key):
        if key in self._pending:
            return self._pending[key]
        return _tree_get(self._scene, self._paths[key])

    def __setitem__(self, key, value):
        if key not in self._paths:
            raise KeyError(key)
        self._pending[key] = jnp.asarray(value, jnp.float32)

    def update(self, values=None):
        """Apply pending writes; returns the updated scene (also stored on
        self).  `values` may be a dict of key->value applied first, mirroring
        params.update(opt) in the reference optimizers."""
        if values is not None:
            for k, v in values.items():
                if k in self._paths:
                    self[k] = v
        scene = self._scene
        touched = []
        for key, value in self._pending.items():
            path = self._paths[key]
            old = _tree_get(scene, path)
            value = jnp.broadcast_to(jnp.asarray(value, jnp.float32), jnp.shape(old))
            scene = _tree_set(scene, path, value)
            touched.append(path)
        self._pending.clear()
        scene = _run_parameters_changed(scene, touched)
        self._scene = scene
        return scene


def _run_parameters_changed(scene, touched_paths):
    """Recompute derived state of components whose parameters changed
    (the reference's parameters_changed() cascade)."""
    recomputed = set()
    geometry_touched = False
    for path in touched_paths:
        if path and path[0] == "geometry":
            geometry_touched = True
            continue
        # component root = ('bsdfs', i) / ('media', i) / ('emitters', i) ...
        root = path[:2]
        if root in recomputed or len(root) < 2:
            continue
        recomputed.add(root)
        comp = _tree_get(scene, root)
        if hasattr(comp, "parameters_changed"):
            scene = _tree_set(scene, root, comp.parameters_changed())
    if geometry_touched:
        # vertex buffer edits re-derive the triangle tables eagerly so
        # non-jit consumers (bbox queries, emitter CDFs) stay consistent;
        # render passes additionally refresh inside the trace for AD
        scene = scene.replace(geometry=scene.geometry.refresh())
    return scene


def traverse(scene):
    """Return the SceneParameters view (reference: mi.traverse, util.py:292)."""
    return SceneParameters(scene)
