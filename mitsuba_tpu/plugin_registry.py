"""User-defined plugin registration (reference: the ``mi.register_bsdf`` /
``register_integrator`` / … family bound via MI_PY_REGISTER_OBJECT,
src/render/python/bsdf_v.cpp:214 and siblings; exercised by
src/render/tests/test_bsdf.py:57 ``mi.register_bsdf('dummy', DummyBSDF)`` and
src/python/python/ad/integrators/prb.py:259
``mi.register_integrator('prb', lambda props: PRBIntegrator(props))``).

``register_<category>(name, constructor)`` makes ``name`` loadable from scene
dicts and XML.  The constructor receives the raw property dict (our
``Properties`` analog) and returns one of:

* a plugin **object** implementing the category's duck-typed interface
  (supported for behavioral categories whose dispatch loops are duck-typed:
  ``bsdf``, ``phase``, ``texture``, ``integrator``, ``medium``, ``volume``).
  The object must be a JAX pytree (e.g. a ``flax.struct.dataclass``) since it
  is embedded in the Scene pytree and traced under ``jit``.  For ``bsdf``:
  ``eval/pdf/sample`` (see render/bsdfs.py); for ``phase``:
  ``eval_pdf/sample`` (render/phase.py); for ``texture``:
  ``eval(uv, wavelengths, n_channels)``.
* a plain **spec dict** (``{"type": <builtin-or-registered>, ...}``) that the
  loader re-parses — "plugin expansion", the analog of the reference's
  plugins that instantiate other plugins through ``PluginManager``.  This is
  the only supported return for structural categories whose dispatch is
  static (``shape``, ``emitter``, ``sensor``, ``sampler``, ``film``,
  ``rfilter``): a procedural shape expands to a ``mesh`` dict, a compound
  emitter to an ``envmap`` dict, etc.

Differentiable parameters: if the constructed object defines
``traverse_paths() -> [(dotted_suffix, attr_path_tuple), ...]`` the loader
registers those leaves with SceneParameters under ``"<name>.<suffix>"`` —
the analog of the reference's ``traverse(callback)`` (object.h:224).
"""
from __future__ import annotations

CATEGORIES = (
    "bsdf", "texture", "emitter", "sensor", "shape", "phase", "medium",
    "volume", "integrator", "sampler", "film", "rfilter",
)

# categories whose constructors may return first-class objects (duck-typed
# dispatch); the rest are expansion-only
OBJECT_CATEGORIES = frozenset(
    {"bsdf", "texture", "phase", "integrator", "medium", "volume"}
)

_REGISTRY: dict[str, dict] = {c: {} for c in CATEGORIES}

# builtin names of categories whose loader dispatch has no mutable type set
# (guards the no-shadowing contract for them too; the loader's *_TYPES sets
# cover the rest)
_STATIC_BUILTINS = {
    "sampler": {"independent", "stratified", "multijitter", "orthogonal",
                "ldsampler", "sobol"},
    "film": {"hdrfilm", "specfilm"},
    "rfilter": {"box", "tent", "gaussian", "mitchell", "catmullrom", "lanczos"},
    "volume": {"constvolume", "gridvolume", "rgb", "uniform"},
    "texture": {"bitmap", "checkerboard", "constant", "mesh_attribute",
                "volume", "uniform", "regular", "irregular", "srgb", "rgb",
                "d65", "blackbody", "singleton"},
}

# maximum nested expansions while resolving one spec (cycle guard)
_MAX_EXPANSION_DEPTH = 8


def _loader_type_sets():
    """The scene loader's category -> builtin-name-set tables (mutated on
    register so nested-plugin detection and pass routing see custom names)."""
    from .render import scene_loader as L

    return {
        "bsdf": L.BSDF_TYPES,
        "shape": L.SHAPE_TYPES,
        "emitter": L.EMITTER_TYPES,
        "sensor": L.SENSOR_TYPES,
        "medium": L.MEDIUM_TYPES,
        "phase": L.PHASE_TYPES,
        "integrator": L.INTEGRATOR_TYPES,
    }


def register_plugin(category, name, constructor):
    """Register ``constructor`` for scene-dict/XML specs of ``type: name``.

    Overwrites any previous registration of the same name (matching the
    reference, where re-registration replaces the trampoline class).
    Builtin names cannot be shadowed.
    """
    if category not in CATEGORIES:
        raise ValueError(
            f"unknown plugin category {category!r}; expected one of {CATEGORIES}"
        )
    if not callable(constructor):
        raise TypeError(f"constructor for {category}:{name} must be callable")
    sets = _loader_type_sets()
    is_builtin = (
        category in sets and name in sets[category]
        and name not in _REGISTRY[category]
    ) or name in _STATIC_BUILTINS.get(category, ())
    if is_builtin:
        raise ValueError(
            f"cannot shadow builtin {category} plugin {name!r}"
        )
    _REGISTRY[category][name] = constructor
    if category in sets:
        sets[category].add(name)


def unregister_plugin(category, name):
    """Remove a previously registered plugin (no-op if absent)."""
    if _REGISTRY.get(category, {}).pop(name, None) is not None:
        sets = _loader_type_sets()
        if category in sets:
            sets[category].discard(name)


def lookup(category, name):
    """Constructor registered for (category, name), or None."""
    return _REGISTRY.get(category, {}).get(name)


def construct(category, name, spec):
    """Run the registered constructor, following dict-expansions until a
    non-dict result or an unregistered type is reached.

    Returns (result, final_type): ``result`` is a plugin object (allowed only
    for OBJECT_CATEGORIES) or a spec dict whose ``type`` is not a registered
    name of this category (i.e. a builtin spec to hand back to the loader).
    """
    ctor = lookup(category, name)
    if ctor is None:
        raise KeyError(f"no registered {category} plugin {name!r}")
    spec = dict(spec)
    for _ in range(_MAX_EXPANSION_DEPTH):
        out = ctor(spec)
        if not isinstance(out, dict):
            if category not in OBJECT_CATEGORIES:
                raise TypeError(
                    f"{category} plugin {name!r} returned a {type(out).__name__}; "
                    f"structural categories must expand to a spec dict "
                    f"(got object return, only supported for "
                    f"{sorted(OBJECT_CATEGORIES)})"
                )
            return out, name
        t = out.get("type")
        ctor = lookup(category, t)
        if ctor is None:
            return out, t
        spec, name = dict(out), t
    raise RecursionError(
        f"{category} plugin expansion exceeded {_MAX_EXPANSION_DEPTH} levels "
        f"(cycle?) starting from {name!r}"
    )


def record_traverse_paths(obj, name, paths):
    """Append (dotted_key, attr_path) pairs advertised by a user plugin
    object via ``traverse_paths()`` to the loader's path list."""
    tp = getattr(obj, "traverse_paths", None)
    if tp is None:
        return
    for suffix, attr_path in tp():
        paths.append((f"{name}.{suffix}", tuple(attr_path)))


def _make_register(cat):
    def _register(name, constructor):
        register_plugin(cat, name, constructor)
    _register.__name__ = f"register_{cat}"
    _register.__qualname__ = f"register_{cat}"
    _register.__doc__ = (
        f"Register a user-defined {cat} plugin under ``name`` "
        f"(see plugin_registry module docs for the constructor contract)."
    )
    return _register


register_bsdf = _make_register("bsdf")
register_texture = _make_register("texture")
register_emitter = _make_register("emitter")
register_sensor = _make_register("sensor")
register_shape = _make_register("shape")
register_phase = _make_register("phase")
register_phasefunction = register_phase  # reference binding name (phase_v.cpp)
register_medium = _make_register("medium")
register_volume = _make_register("volume")
register_integrator = _make_register("integrator")
register_sampler = _make_register("sampler")
register_film = _make_register("film")
register_rfilter = _make_register("rfilter")
