"""Scene-dict loader (reference: src/core/xml.cpp load_dict semantics +
mi.cornell_box, src/python/python/util.py:757-891).

Parses the reference's scene-dict vocabulary into the Scene pytree, resolving
<ref> ids, nested objects and defaults, and records dotted parameter paths for
traverse()/SceneParameters (reference: util.py:13-355).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..variant import current_variant
from ..core.transform import Transform, build_transform
from .. import plugin_registry as PR
from . import bsdfs as B
from . import bsdf_principled as BP
from . import emitters as E
from . import sensors as SEN
from . import shapes as SH
from . import textures as TX
from .film import Film
from .scene import Scene

BSDF_TYPES = {
    "diffuse", "dielectric", "thindielectric", "conductor", "roughconductor",
    "roughdielectric", "roughplastic", "plastic", "twosided", "null", "mask",
    "blendbsdf", "polarizer", "retarder", "circular", "pplastic", "normalmap", "bumpmap",
    "principled", "principledthin", "principled_thin", "measured",
    "measured_polarized", "hair",
}
SHAPE_TYPES = {
    "rectangle", "cube", "sphere", "obj", "ply", "disk", "serialized",
    "cylinder", "sdfgrid", "bsplinecurve", "linearcurve", "mesh", "blender",
}
EMITTER_TYPES = {"constant", "point", "directional", "envmap", "spot", "projector"}
SENSOR_TYPES = {
    "perspective", "thinlens", "orthographic", "radiancemeter",
    "irradiancemeter", "distant", "batch",
}
MEDIUM_TYPES = {"homogeneous", "heterogeneous"}
PHASE_TYPES = {
    "isotropic", "hg", "rayleigh", "mie", "tabphase", "tabphase_polarized",
    "blendphase",
}
INTEGRATOR_TYPES = {
    "path", "direct", "depth", "aov", "volpath", "volpathmis", "volpathaos",
    "stokes", "moment", "ptracer", "prb", "prb_basic", "prbvolpath",
    "prb_unpolarized", "prb_polarized", "prb_volpathaos",
    "direct_projective", "prb_projective",
}


# ---------------------------------------------------------------------------
# Textures / spectra
# ---------------------------------------------------------------------------

def _expand_registered(category, spec):
    """Expand a spec whose type is a user-registered *structural* plugin
    (shape/emitter/sensor/sampler/film/rfilter) into the builtin spec dict
    its constructor returns (reference: PluginManager instantiation of
    Python-registered trampolines, src/render/python/*_v.cpp
    MI_PY_REGISTER_OBJECT)."""
    if isinstance(spec, dict):
        t = spec.get("type")
        if t is not None and PR.lookup(category, t) is not None:
            out, _ = PR.construct(category, t, spec)
            return out
    return spec


def _floats(v):
    """Float list from a list/array or the reference's comma/space-separated
    string spelling (XML properties arrive as strings, xml.cpp)."""
    if isinstance(v, str):
        return [float(x) for x in v.replace(",", " ").split()]
    return v


def parse_texture(spec, default=1.0, paths=None, prefix=None, emissive=False):
    """Parse a texture/spectrum spec (float | rgb dict | plugin dict).
    Returns (texture, name-of-differentiable-leaf)."""
    if spec is None:
        spec = default
    if isinstance(spec, (int, float)):
        tex = TX.ConstantTexture(value=jnp.asarray([float(spec)], jnp.float32))
        return tex, "value"
    if isinstance(spec, (list, tuple, np.ndarray)):
        arr = np.asarray(spec, np.float32)
        if arr.ndim >= 2:
            # a raw [H, W(, C)] image array is a bitmap texture, not a
            # constant (matches load_dict accepting mi.Bitmap-valued props)
            if arr.ndim == 2:
                arr = arr[..., None]
            return TX.BitmapTexture(data=jnp.asarray(arr)), "data"
        tex = TX.ConstantTexture(
            value=jnp.asarray(arr, jnp.float32), emissive=emissive
        )
        return tex, "value"
    t = spec["type"]
    if t in ("rgb", "srgb"):
        # reference srgb plugin takes its triple under 'color'
        # (src/spectra/srgb.cpp); 'value' is the dict-shorthand spelling
        val = spec["color"] if "color" in spec else spec["value"]
        return (
            TX.ConstantTexture(
                value=jnp.asarray(val, jnp.float32), emissive=emissive
            ),
            "value",
        )
    if t == "uniform":
        return TX.ConstantTexture(value=jnp.asarray([spec.get("value", 1.0)], jnp.float32)), "value"
    if t == "checkerboard":
        to_uv = spec.get("to_uv")
        uv_scale = np.asarray([1.0, 1.0], np.float32)
        uv_offset = np.asarray([0.0, 0.0], np.float32)
        if to_uv is not None:
            tr = build_transform(to_uv)
            m = np.asarray(tr.m)
            uv_scale = np.asarray([m[0, 0], m[1, 1]], np.float32)
            uv_offset = np.asarray([m[0, 3], m[1, 3]], np.float32)
        c0, _ = parse_texture(spec.get("color0", 0.4))
        c1, _ = parse_texture(spec.get("color1", 0.2))
        return (
            TX.CheckerboardTexture(
                color0=c0.value, color1=c1.value,
                uv_scale=jnp.asarray(uv_scale), uv_offset=jnp.asarray(uv_offset),
            ),
            "color0",
        )
    if t == "bitmap":
        if "data" in spec:
            data = jnp.asarray(spec["data"], jnp.float32)
        else:
            data = jnp.asarray(_load_image(_rfile(spec["filename"])), jnp.float32)
        if data.ndim == 2:
            data = data[..., None]
        return TX.BitmapTexture(data=data), "data"
    if t == "singleton":
        return (
            TX.SingletonSpectrum(
                value=jnp.asarray(spec.get("value", 1.0), jnp.float32),
                wavelength=jnp.asarray(spec.get("wavelength", 550.0), jnp.float32),
            ),
            "value",
        )
    if t == "d65":
        return TX.D65Spectrum(scale=jnp.asarray(spec.get("scale", 1.0), jnp.float32)), "scale"
    if t == "blackbody":
        return (
            TX.BlackbodySpectrum(
                temperature=jnp.asarray(spec.get("temperature", 6504.0), jnp.float32),
                scale=jnp.asarray(spec.get("scale", 1.0), jnp.float32),
            ),
            "scale",
        )
    if t == "regular":
        return (
            TX.RegularSpectrum(
                values=jnp.asarray(_floats(spec["values"]), jnp.float32),
                wl_min=jnp.asarray(spec.get("wavelength_min", spec.get("lambda_min", 360.0)), jnp.float32),
                wl_max=jnp.asarray(spec.get("wavelength_max", spec.get("lambda_max", 830.0)), jnp.float32),
            ),
            "values",
        )
    if t == "irregular":
        return (
            TX.IrregularSpectrum(
                wavelengths_nodes=jnp.asarray(_floats(spec["wavelengths"]), jnp.float32),
                values=jnp.asarray(_floats(spec["values"]), jnp.float32),
            ),
            "values",
        )
    if t == "volume":
        # 3D texture slice (reference: src/textures/volume.cpp) — nests a
        # Volume plugin spec (gridvolume/constvolume)
        from .volumes import parse_volume

        vspec = spec.get("volume")
        if vspec is None and "data" in spec:
            vspec = {k: v for k, v in spec.items() if k != "type"}
            vspec["type"] = "gridvolume"
        vol, _ = parse_volume(vspec if vspec is not None else 1.0, 3)
        return TX.VolumeTexture(volume=vol, emissive=emissive), "volume"
    if t == "mesh_attribute":
        # placeholder patched after the geometry build (values3 filled from
        # the owning mesh's per-vertex data; see _patch_mesh_attributes)
        return (
            TX.MeshAttributeTexture(
                values3=jnp.zeros((1, 3, 3), jnp.float32),
                prim_offset=-1,
                name=spec.get("name", "vertex_color"),
            ),
            "values3",
        )
    if PR.lookup("texture", t) is not None:
        out, _ = PR.construct("texture", t, spec)
        if isinstance(out, dict):
            return parse_texture(out, default, paths, prefix, emissive)
        if isinstance(out, tuple) and len(out) == 2:
            return out  # (texture, differentiable-leaf-name)
        leaf = getattr(out, "param_leaf", None)
        if leaf is None:
            fields = getattr(out, "__dataclass_fields__", {})
            leaf = "value" if "value" in fields else next(iter(fields), "value")
        return out, leaf
    raise ValueError(f"unknown texture/spectrum type {t!r}")



def _rfile(fn):
    """Resolve a scene-resource filename through the process file resolver
    (reference: fresolver.cpp; xml.cpp resolves every `filename` property)."""
    from ..core.fresolver import file_resolver

    return file_resolver().resolve(str(fn))

def _load_image(filename):
    fn = str(filename)
    if fn.endswith(".npy"):
        return np.load(fn)
    if fn.endswith(".pfm"):
        return _read_pfm(fn)
    raise ValueError(
        f"unsupported image format for {fn!r} (npy/pfm supported; pass 'data' directly)"
    )


def _read_pfm(fn):
    with open(fn, "rb") as f:
        header = f.readline().strip()
        color = header == b"PF"
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        data = np.fromfile(f, "<f4" if scale < 0 else ">f4")
        data = data.reshape(h, w, 3 if color else 1)
        return data[::-1]


# ---------------------------------------------------------------------------
# BSDFs
# ---------------------------------------------------------------------------

_IOR_PRESETS = {"bk7": 1.5046, "water": 1.3330, "diamond": 2.419, "air": 1.000277}

# Spectrally-averaged eta/k for common conductors (reference: src/core/ior.h data)
_CONDUCTOR_PRESETS = {
    "Au": ([0.143, 0.375, 1.442], [3.983, 2.386, 1.603]),
    "Ag": ([0.156, 0.144, 0.135], [3.60, 3.13, 2.38]),
    "Al": ([1.345, 0.965, 0.617], [7.47, 6.40, 5.30]),
    "Cu": ([0.20, 0.924, 1.102], [3.91, 2.45, 2.14]),
    "none": ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
}


def _ior(v, default=1.5046):
    if v is None:
        return default
    if isinstance(v, str):
        return _IOR_PRESETS[v.lower()]
    return float(v)



def _nested_bsdf_spec(spec, t):
    """The one nested BSDF of a wrapper plugin (twosided/mask/normalmap/...)."""
    nested = spec.get("bsdf")
    if nested is None:
        nested = next(
            (v for k, v in spec.items()
             if isinstance(v, dict) and v.get("type") in BSDF_TYPES),
            None,
        )
    if nested is None:
        raise ValueError(f"{t!r} needs a nested BSDF (add a 'bsdf' child)")
    return nested


def parse_bsdf(spec, name, paths):
    t = spec["type"]
    if t == "twosided":
        nested = parse_bsdf(_nested_bsdf_spec(spec, t), name, paths)
        return B.TwoSidedBSDF(nested=nested)
    if t == "diffuse":
        tex, leaf = parse_texture(spec.get("reflectance", 0.5))
        paths.append((f"{name}.reflectance.{leaf}", ("reflectance", leaf)))
        return B.DiffuseBSDF(reflectance=tex)
    if t == "dielectric":
        int_ior = _ior(spec.get("int_ior"), 1.5046)
        ext_ior = _ior(spec.get("ext_ior"), 1.000277)
        sr, _ = parse_texture(spec.get("specular_reflectance", 1.0))
        st, _ = parse_texture(spec.get("specular_transmittance", 1.0))
        return B.SmoothDielectricBSDF(
            eta=jnp.asarray(int_ior / ext_ior, jnp.float32),
            specular_reflectance=sr, specular_transmittance=st,
        )
    if t == "roughdielectric":
        int_ior = _ior(spec.get("int_ior"), 1.5046)
        ext_ior = _ior(spec.get("ext_ior"), 1.000277)
        if "eta" in spec:
            eta = float(spec["eta"])
        else:
            eta = int_ior / ext_ior
        alpha = spec.get("alpha", 0.1)
        if isinstance(alpha, dict):
            alpha = float(alpha.get("value", 0.1))
        sr, _ = parse_texture(spec.get("specular_reflectance", 1.0))
        st, _ = parse_texture(spec.get("specular_transmittance", 1.0))
        paths.append((f"{name}.eta", ("eta",)))
        paths.append((f"{name}.alpha.value", ("alpha",)))
        return B.RoughDielectricBSDF(
            eta=jnp.asarray(eta, jnp.float32),
            alpha=jnp.asarray(float(alpha), jnp.float32),
            specular_reflectance=sr, specular_transmittance=st,
        )
    if t == "thindielectric":
        int_ior = _ior(spec.get("int_ior"), 1.5046)
        ext_ior = _ior(spec.get("ext_ior"), 1.000277)
        sr, _ = parse_texture(spec.get("specular_reflectance", 1.0))
        st, _ = parse_texture(spec.get("specular_transmittance", 1.0))
        return B.ThinDielectricBSDF(
            eta=jnp.asarray(int_ior / ext_ior, jnp.float32),
            specular_reflectance=sr, specular_transmittance=st,
        )
    if t in ("conductor", "roughconductor"):
        mat = spec.get("material", "none")
        if "eta" in spec:
            eta = np.asarray(spec["eta"], np.float32)
            k = np.asarray(spec.get("k", 1.0), np.float32)
        else:
            eta, k = (np.asarray(x, np.float32) for x in _CONDUCTOR_PRESETS[mat])
        nc = current_variant().n_channels
        if eta.ndim == 1 and eta.shape[0] == 3 and nc != 3:
            eta, k = eta.mean(keepdims=True), k.mean(keepdims=True)
        sr, _ = parse_texture(spec.get("specular_reflectance", 1.0))
        if t == "conductor":
            return B.SmoothConductorBSDF(
                eta=jnp.asarray(eta), k=jnp.asarray(k), specular_reflectance=sr
            )
        alpha = float(spec.get("alpha", 0.1))
        au = float(spec.get("alpha_u", alpha))
        av = float(spec.get("alpha_v", alpha))
        paths.append((f"{name}.alpha", ("alpha_u",)))
        return B.RoughConductorBSDF(
            eta=jnp.asarray(eta), k=jnp.asarray(k),
            alpha_u=jnp.asarray(au, jnp.float32), alpha_v=jnp.asarray(av, jnp.float32),
            specular_reflectance=sr,
        )
    if t == "pplastic":
        dr, leaf = parse_texture(spec.get("diffuse_reflectance", 0.5))
        paths.append((f"{name}.diffuse_reflectance.{leaf}", ("diffuse_reflectance", leaf)))
        sr, _ = parse_texture(spec.get("specular_reflectance", 1.0))
        int_ior = _ior(spec.get("int_ior"), 1.49)
        ext_ior = _ior(spec.get("ext_ior"), 1.000277)
        return B.PPlasticBSDF(
            eta=jnp.asarray(int_ior / ext_ior, jnp.float32),
            alpha=jnp.asarray(float(spec.get("alpha", 0.06)), jnp.float32),
            diffuse_reflectance=dr, specular_reflectance=sr,
        )
    if t == "roughplastic":
        dr, leaf = parse_texture(spec.get("diffuse_reflectance", 0.5))
        paths.append((f"{name}.diffuse_reflectance.{leaf}", ("diffuse_reflectance", leaf)))
        sr, _ = parse_texture(spec.get("specular_reflectance", 1.0))
        int_ior = _ior(spec.get("int_ior"), 1.49)
        ext_ior = _ior(spec.get("ext_ior"), 1.000277)
        alpha = float(spec.get("alpha", 0.1))
        return B.RoughPlasticBSDF(
            eta=jnp.asarray(int_ior / ext_ior, jnp.float32),
            alpha=jnp.asarray(alpha, jnp.float32),
            diffuse_reflectance=dr, specular_reflectance=sr,
        )
    if t == "plastic":
        # true smooth plastic: delta lobe + interreflected diffuse
        # (reference: src/bsdfs/plastic.cpp)
        dr, leaf = parse_texture(spec.get("diffuse_reflectance", 0.5))
        paths.append((f"{name}.diffuse_reflectance.{leaf}", ("diffuse_reflectance", leaf)))
        sr, _ = parse_texture(spec.get("specular_reflectance", 1.0))
        int_ior = _ior(spec.get("int_ior"), 1.49)
        ext_ior = _ior(spec.get("ext_ior"), 1.000277)
        d_mean = float(dr.mean())
        s_mean = float(sr.mean())
        return BP.SmoothPlasticBSDF(
            eta=jnp.asarray(int_ior / ext_ior, jnp.float32),
            diffuse_reflectance=dr, specular_reflectance=sr,
            nonlinear=bool(spec.get("nonlinear", False)),
            specular_sampling_weight=s_mean / max(d_mean + s_mean, 1e-8),
        )
    if t == "hair":
        from .bsdf_hair import HairBSDF

        sigma_a = None
        if "sigma_a" in spec:
            sigma_a, leaf = parse_texture(spec["sigma_a"])
            paths.append((f"{name}.sigma_a.{leaf}", ("sigma_a", leaf)))
        int_ior = _ior(spec.get("int_ior"), 1.55)      # amber
        ext_ior = _ior(spec.get("ext_ior"), 1.000277)
        paths.append((f"{name}.eumelanin", ("eumelanin",)))
        paths.append((f"{name}.pheomelanin", ("pheomelanin",)))
        return HairBSDF(
            longitudinal_roughness=jnp.asarray(
                float(spec.get("longitudinal_roughness", 0.3)), jnp.float32
            ),
            azimuthal_roughness=jnp.asarray(
                float(spec.get("azimuthal_roughness", 0.3)), jnp.float32
            ),
            alpha=jnp.asarray(float(spec.get("scale_tilt", 2.0)), jnp.float32),
            eta=jnp.asarray(int_ior / ext_ior, jnp.float32),
            eumelanin=jnp.asarray(float(spec.get("eumelanin", 1.3)), jnp.float32),
            pheomelanin=jnp.asarray(float(spec.get("pheomelanin", 0.2)), jnp.float32),
            sigma_a=sigma_a,
            scale=jnp.asarray(float(spec.get("scale", 1.0)), jnp.float32),
        )
    if t == "measured":
        from .bsdf_measured import MeasuredBSDF

        return MeasuredBSDF.from_file(_rfile(spec["filename"]))
    if t == "measured_polarized":
        from .bsdf_measured_polarized import MeasuredPolarizedBSDF

        return MeasuredPolarizedBSDF.from_file(
            _rfile(spec["filename"]),
            alpha_sample=float(spec.get("alpha_sample", 0.1)),
            wavelength=float(spec.get("wavelength", -1.0)),
        )
    if t == "principled":
        # reference: src/bsdfs/principled.cpp:189-237 (param parsing + the
        # specular<->eta one-to-one map)
        def _has(key):
            v = spec.get(key)
            if v is None:
                return False
            if isinstance(v, (int, float)):
                return float(v) != 0.0
            return True
        if "eta" in spec and "specular" in spec:
            raise ValueError("principled: specify either 'eta' or 'specular'")
        if "eta" in spec:
            eta = float(spec["eta"])
            if _has("spec_trans") and eta == 1.0:
                eta = 1.001
        else:
            specular = float(spec.get("specular", 0.5))
            if _has("spec_trans") and specular == 0.0:
                specular = 1e-3
            eta = 2.0 / (1.0 - np.sqrt(0.08 * specular)) - 1.0
        texs = {}
        defaults = dict(
            base_color=0.5, roughness=0.5, anisotropic=0.0, metallic=0.0,
            spec_trans=0.0, spec_tint=0.0, sheen=0.0, sheen_tint=0.0,
            flatness=0.0, clearcoat=0.0, clearcoat_gloss=0.0,
        )
        for key, dflt in defaults.items():
            tex, leaf = parse_texture(spec.get(key, dflt))
            texs[key] = tex
            if key in ("base_color", "roughness", "metallic"):
                paths.append((f"{name}.{key}.{leaf}", (key, leaf)))
        return BP.PrincipledBSDF(
            eta=jnp.asarray(eta, jnp.float32),
            has_anisotropic=_has("anisotropic"), has_metallic=_has("metallic"),
            has_spec_trans=_has("spec_trans"), has_spec_tint=_has("spec_tint"),
            has_sheen=_has("sheen"), has_sheen_tint=_has("sheen_tint"),
            has_flatness=_has("flatness"), has_clearcoat=_has("clearcoat"),
            spec_srate=float(spec.get("main_specular_sampling_rate", 1.0)),
            clearcoat_srate=float(spec.get("clearcoat_sampling_rate", 1.0)),
            diff_refl_srate=float(spec.get("diffuse_reflectance_sampling_rate", 1.0)),
            **texs,
        )
    if t in ("principledthin", "principled_thin"):
        # reference: src/bsdfs/principledthin.cpp:158-190 registers the
        # plugin as "principledthin"; the underscored alias is kept for
        # backward compatibility with earlier versions of this loader.
        def _has(key):
            v = spec.get(key)
            if v is None:
                return False
            if isinstance(v, (int, float)):
                return float(v) != 0.0
            return True
        texs = {}
        defaults = dict(
            base_color=0.5, roughness=0.5, anisotropic=0.0, spec_trans=0.0,
            spec_tint=0.0, sheen=0.0, sheen_tint=0.0, flatness=0.0,
            diff_trans=0.0,
        )
        for key, dflt in defaults.items():
            tex, leaf = parse_texture(spec.get(key, dflt))
            texs[key] = tex
            if key in ("base_color", "roughness"):
                paths.append((f"{name}.{key}.{leaf}", (key, leaf)))
        eta_tex, _ = parse_texture(spec.get("eta", 1.5))
        return BP.PrincipledThinBSDF(
            eta_thin=eta_tex,
            has_anisotropic=_has("anisotropic"),
            has_spec_trans=_has("spec_trans"), has_spec_tint=_has("spec_tint"),
            has_sheen=_has("sheen"), has_sheen_tint=_has("sheen_tint"),
            has_flatness=_has("flatness"), has_diff_trans=_has("diff_trans"),
            spec_refl_srate=float(spec.get("specular_reflectance_sampling_rate", 1.0)),
            spec_trans_srate=float(spec.get("specular_transmittance_sampling_rate", 1.0)),
            diff_trans_srate=float(spec.get("diffuse_transmittance_sampling_rate", 1.0)),
            diff_refl_srate=float(spec.get("diffuse_reflectance_sampling_rate", 1.0)),
            **texs,
        )
    if t == "mask":
        nested = parse_bsdf(_nested_bsdf_spec(spec, t), name, paths)
        op, leaf = parse_texture(spec.get("opacity", 0.5))
        paths.append((f"{name}.opacity.{leaf}", ("opacity", leaf)))
        return B.MaskBSDF(nested=nested, opacity=op)
    if t in ("normalmap", "bumpmap"):
        nested = parse_bsdf(_nested_bsdf_spec(spec, t), name, paths)
        tex_spec = next(
            (spec[k] for k in ("normalmap", "texture", "bumpmap") if spec.get(k) is not None),
            None,
        )  # explicit None checks: `or` would truth-test raw numpy arrays
        tex, _ = parse_texture(tex_spec if tex_spec is not None else [0.5, 0.5, 1.0])
        if t == "bumpmap" and hasattr(tex, "data"):
            # height -> tangent-space normals at load time (reference:
            # src/bsdfs/bumpmap.cpp evaluates dheight/duv at runtime; our
            # wavefront carries no uv-derivatives, so bake the equivalent
            # normal map from central differences once)
            h = np.asarray(tex.data)
            if h.ndim == 3:
                h = h.mean(-1)
            scale = float(spec.get("scale", 1.0))
            gy, gx = np.gradient(h * scale)
            nrm = np.stack(
                [-gx * h.shape[1], -gy * h.shape[0], np.ones_like(h)], axis=-1
            )
            nrm = nrm / np.linalg.norm(nrm, axis=-1, keepdims=True)
            tex = TX.BitmapTexture(data=jnp.asarray((nrm + 1.0) * 0.5, jnp.float32))
        return B.NormalmapBSDF(nested=nested, normalmap=tex)
    if t == "blendbsdf":
        nested = [
            v for k, v in spec.items()
            if isinstance(v, dict) and v.get("type") in BSDF_TYPES
        ]
        if len(nested) != 2:
            raise ValueError("blendbsdf needs exactly two nested BSDFs")
        w, leaf = parse_texture(spec.get("weight", 0.5))
        paths.append((f"{name}.weight.{leaf}", ("weight", leaf)))
        return B.BlendBSDF(
            bsdf_a=parse_bsdf(nested[0], name + ".a", paths),
            bsdf_b=parse_bsdf(nested[1], name + ".b", paths),
            weight=w,
        )
    if t == "polarizer":
        tr, leaf = parse_texture(spec.get("transmittance", 1.0))
        paths.append((f"{name}.theta", ("theta",)))
        return B.PolarizerBSDF(
            theta=jnp.asarray(np.deg2rad(float(spec.get("theta", 0.0))), jnp.float32),
            transmittance=tr,
        )
    if t == "circular":
        tr, _ = parse_texture(spec.get("transmittance", 1.0))
        return B.CircularPolarizerBSDF(
            transmittance=tr, left=bool(spec.get("left_handed", False))
        )
    if t == "retarder":
        tr, _ = parse_texture(spec.get("transmittance", 1.0))
        paths.append((f"{name}.theta", ("theta",)))
        return B.RetarderBSDF(
            theta=jnp.asarray(np.deg2rad(float(spec.get("theta", 0.0))), jnp.float32),
            delta_phase=jnp.asarray(
                np.deg2rad(float(spec.get("delta", 90.0))), jnp.float32
            ),
            transmittance=tr,
        )
    if t == "null":
        return B.NullBSDF()
    if PR.lookup("bsdf", t) is not None:
        out, _ = PR.construct("bsdf", t, spec)
        if isinstance(out, dict):
            return parse_bsdf(out, name, paths)
        PR.record_traverse_paths(out, name, paths)
        return out
    raise ValueError(f"unknown bsdf type {t!r}")


# ---------------------------------------------------------------------------
# load_dict
# ---------------------------------------------------------------------------

def _expand_instances(d):
    """Flatten shapegroup/instance pairs (reference: src/shapes/instance.cpp,
    shapegroup.cpp) into concrete shapes with composed to_world transforms.

    TPU-native stance: the wavefront tracer keeps ONE flat SoA geometry, so
    instances are baked at load time — each instance contributes copies of
    the group's shapes with to_world = instance.to_world @ child.to_world.
    This trades the reference's two-level-BVH memory sharing for dense
    tables (the right trade until scenes carry thousands of instances)."""
    # `merge` nodes (reference: src/shapes/merge.cpp — a mesh-consolidation
    # wrapper) are flattened: children become top-level shapes.  The SoA
    # geometry build already concatenates every mesh into one table, so the
    # reference's merge optimization happens unconditionally here.
    flat = {}
    for name, spec in d.items():
        if isinstance(spec, dict) and spec.get("type") == "merge":
            for k, v in spec.items():
                if isinstance(v, dict) and v.get("type") in SHAPE_TYPES:
                    flat[f"{name}.{k}"] = v
        else:
            flat[name] = spec
    d = flat

    groups = {}
    out = {}
    instances = []
    for name, spec in d.items():
        if isinstance(spec, dict) and spec.get("type") == "shapegroup":
            groups[name] = {
                k: v for k, v in spec.items()
                if isinstance(v, dict) and v.get("type") in SHAPE_TYPES
            }
        elif isinstance(spec, dict) and spec.get("type") == "instance":
            instances.append((name, spec))
        else:
            out[name] = spec
    for name, spec in instances:
        ref = next(
            (v for v in spec.values()
             if isinstance(v, dict) and v.get("type") == "ref"),
            None,
        )
        gid = spec.get("shapegroup", ref["id"] if ref else None)
        if isinstance(gid, dict):
            gid = gid.get("id")
        if gid not in groups:
            raise ValueError(f"instance {name!r}: unknown shapegroup {gid!r}")
        inst_tw = build_transform(spec.get("to_world", Transform.identity()))
        for child_name, child in groups[gid].items():
            child = dict(child)
            child_tw = build_transform(child.get("to_world", Transform.identity()))
            child["to_world"] = inst_tw @ child_tw
            out[f"{name}.{child_name}"] = child
    return out


def load_dict(d):
    """Build a Scene from a reference-style nested dict
    (reference: xml.cpp load_dict + util.py cornell_box)."""
    from ..integrators import make_integrator
    from .media import parse_medium, parse_phase

    var = current_variant()
    d = dict(d)
    d.pop("type", None)
    # optional non-uniform emitter selection (reference: the optional
    # m_emitter_distr, scene.cpp:238-250): "uniform" (default) | "power"
    emitter_sampler = d.pop("emitter_sampler", "uniform")
    fuse_point_lights = d.pop("fuse_point_lights", None)  # None = auto (>4)
    fuse_area_lights = d.pop("fuse_area_lights", None)    # None = auto (>4)
    d = _expand_instances(d)

    sampler_type = "independent"
    named_bsdfs = {}      # id -> (index, instance)
    bsdf_list = []
    bsdf_paths = []       # (key, subpath) relative to instance; rewritten below
    emitter_list = []
    emitter_paths = []
    media_list = []
    media_names = {}
    phase_list = []
    sensor = None
    film = None
    spp = 16
    integrator_spec = {"type": "path"}
    tri_meshes = []
    spheres = []
    capsules = []
    sdf_shapes = []
    shape_records = []    # per shape: dict(bsdf=idx, emitter=idx, name=...)
    param_paths = []      # final (key, full path tuple)

    def register_bsdf(spec, name):
        local_paths = []
        inst = parse_bsdf(spec, name, local_paths)
        idx = len(bsdf_list)
        bsdf_list.append(inst)
        for key, sub in local_paths:
            param_paths.append((key, ("bsdfs", idx) + sub))
        return idx

    def resolve_bsdf(spec, shape_name):
        if spec is None:
            return register_bsdf({"type": "diffuse"}, f"{shape_name}.bsdf")
        if spec.get("type") == "ref":
            rid = spec["id"]
            if rid not in named_bsdfs:
                raise ValueError(f"unresolved bsdf ref {rid!r}")
            return named_bsdfs[rid]
        return register_bsdf(spec, f"{shape_name}.bsdf")

    # pass 1: named top-level bsdfs (so refs resolve)
    for name, spec in d.items():
        if isinstance(spec, dict) and spec.get("type") in BSDF_TYPES:
            named_bsdfs[name] = register_bsdf(spec, name)

    # pass 2: media (named, may be referenced by shapes)
    for name, spec in d.items():
        if isinstance(spec, dict) and spec.get("type") in MEDIUM_TYPES:
            idx = len(media_list)
            med = parse_medium(spec, name, phase_list, param_paths, idx)
            media_list.append(med)
            media_names[name] = idx

    def resolve_medium(spec, owner_name):
        """Medium attachment: {'type':'ref'} to a named medium, or an inline
        medium dict (registered on first use), or None -> -1."""
        if spec is None:
            return -1
        if isinstance(spec, dict) and spec.get("type") == "ref":
            return media_names.get(spec["id"], -1)
        if isinstance(spec, dict) and spec.get("type") in MEDIUM_TYPES:
            idx = len(media_list)
            med = parse_medium(spec, owner_name, phase_list, param_paths, idx)
            media_list.append(med)
            return idx
        return -1

    # pass 3: everything else
    shape_emitter_specs = []   # (shape_index, radiance_spec, shape_name)
    for name, spec in d.items():
        if not isinstance(spec, dict):
            continue
        t = spec.get("type")
        if t in BSDF_TYPES or t in MEDIUM_TYPES:
            continue
        if t == "integrator" or t in INTEGRATOR_TYPES:
            integrator_spec = spec
        elif t in SENSOR_TYPES:
            sensor, film, spp, sampler_type = parse_sensor(spec)
        elif t in EMITTER_TYPES:
            # PR.construct follows nested registrations, so the expanded
            # type is never itself registered — builtin membership suffices
            spec = _expand_registered("emitter", spec)
            t = spec["type"]
            if t not in EMITTER_TYPES:
                raise ValueError(
                    f"registered emitter plugin expanded to "
                    f"non-builtin type {t!r}"
                )
            emitter_list.append(("env" if t in ("constant", "envmap") else "delta", name, spec))
        elif t in SHAPE_TYPES:
            spec = _expand_registered("shape", spec)
            t = spec["type"]
            if t not in SHAPE_TYPES:
                raise ValueError(
                    f"registered shape plugin expanded to "
                    f"non-builtin type {t!r}"
                )
            shape_index = len(shape_records)
            to_world = build_transform(spec.get("to_world", Transform.identity()))
            if t == "rectangle":
                m = SH.make_rectangle(to_world)
                m["shape_index"] = shape_index
                tri_meshes.append(m)
            elif t == "cube":
                m = SH.make_cube(to_world)
                m["shape_index"] = shape_index
                tri_meshes.append(m)
            elif t in ("obj", "ply"):
                m = _load_mesh_native(t, _rfile(spec["filename"]), to_world)
                m["shape_index"] = shape_index
                tri_meshes.append(m)
            elif t in ("mesh", "blender"):
                # programmatic raw-array mesh — the reference's
                # Python-constructed mi.Mesh / Blender-bridge workflow
                # (reference: src/shapes/blender.cpp, mesh.cpp Mesh(name,
                # vertex_count, face_count) + mesh_params.update()); used by
                # LargeSteps-style pipelines that rebuild geometry each step
                V = np.asarray(spec["vertex_positions"], np.float32).reshape(-1, 3)
                F = np.asarray(spec["faces"], np.int32).reshape(-1, 3)
                mm = np.asarray(to_world.m)
                Vw = (mm[:3, :3] @ V.T + mm[:3, 3:4]).T.astype(np.float32)
                m = {"vertices": Vw, "faces": F}
                if "uvs" in spec or "vertex_texcoords" in spec:
                    m["uvs"] = np.asarray(
                        spec.get("uvs", spec.get("vertex_texcoords")), np.float32
                    ).reshape(-1, 2)
                if "normals" in spec or "vertex_normals" in spec:
                    nrm = np.asarray(
                        spec.get("normals", spec.get("vertex_normals")), np.float32
                    ).reshape(-1, 3)
                    m["normals"] = (
                        np.linalg.inv(mm[:3, :3]).T @ nrm.T
                    ).T.astype(np.float32)
                m["shape_index"] = shape_index
                tri_meshes.append(m)
            elif t in ("bsplinecurve", "linearcurve"):
                if "control_points" in spec:
                    cps = np.asarray(spec["control_points"], np.float32)
                    curves = [cps] if cps.ndim == 2 else list(cps)
                else:
                    curves = SH.load_curve_file(_rfile(spec["filename"]))
                if "emitter" in spec:
                    raise ValueError(
                        f"{name}: curve shapes cannot carry an area emitter"
                    )
                # analytic capsule segments — exact round cross-sections
                # (see shapes.make_curve_capsules; replaces the r2-r4
                # triangle-tube tessellation)
                for seg in SH.make_curve_capsules(
                    curves,
                    kind="bspline" if t == "bsplinecurve" else "linear",
                    to_world=to_world,
                    subdiv=int(spec.get("subdiv", 4)),
                ):
                    capsules.append({**seg, "shape_index": shape_index})
            elif t == "sdfgrid":
                if "data" in spec:
                    grid = np.asarray(spec["data"], np.float32)
                else:
                    from .volumes import load_vol_file

                    grid = load_vol_file(_rfile(spec["filename"]))
                    if grid.ndim == 4:
                        grid = grid[..., 0]
                # to_world maps the [0,1]^3 grid to the world; traversal
                # needs world -> local (reference: sdfgrid.cpp)
                to_local = np.linalg.inv(np.asarray(to_world.m, np.float64))
                sdf_shapes.append({
                    "data": grid,
                    "to_local": to_local.astype(np.float32),
                    "shape_index": shape_index,
                })
                param_paths.append(
                    (f"{name}.grid", ("geometry", "sdf_data"))
                )
            elif t == "sphere":
                c = np.asarray(spec.get("center", [0, 0, 0]), np.float32)
                r = float(spec.get("radius", 1.0))
                mm = np.asarray(to_world.m)
                c = mm[:3, :3] @ c + mm[:3, 3]
                scale = float(np.cbrt(abs(np.linalg.det(mm[:3, :3]))))
                s_i = len(spheres)
                spheres.append(
                    {"center": c, "radius": r * scale, "shape_index": shape_index}
                )
                # differentiable analytic-sphere parameters (reference:
                # sphere.cpp traverse(): to_world/center/radius marked
                # Differentiable|Discontinuous)
                param_paths.append(
                    (f"{name}.center",
                     ("geometry", "sph_center", ("slice", s_i, s_i + 1)))
                )
                param_paths.append(
                    (f"{name}.radius",
                     ("geometry", "sph_radius", ("slice", s_i, s_i + 1)))
                )
            elif t == "cylinder":
                # open cylinder p0->p1 tessellated to a triangle strip
                # (reference: src/shapes/cylinder.cpp — analytic there; our
                # SoA triangle tables make a fine tessellation cheaper than a
                # per-type analytic pass at these primitive counts)
                k = 96
                r = float(spec.get("radius", 1.0))
                p0 = np.asarray(spec.get("p0", [0, 0, 0]), np.float32)
                p1 = np.asarray(spec.get("p1", [0, 0, 1]), np.float32)
                axis = p1 - p0
                az = axis / max(np.linalg.norm(axis), 1e-12)
                ax = np.array([1.0, 0, 0], np.float32)
                if abs(az @ ax) > 0.9:
                    ax = np.array([0, 1.0, 0], np.float32)
                ax = ax - (ax @ az) * az
                ax /= np.linalg.norm(ax)
                ay = np.cross(az, ax)
                ang = np.linspace(0, 2 * np.pi, k, endpoint=False)
                ring = (np.outer(np.cos(ang), ax) + np.outer(np.sin(ang), ay)) * r
                V = np.concatenate([p0 + ring, p1 + ring]).astype(np.float32)
                N = np.concatenate([ring / r, ring / r]).astype(np.float32)
                idx = np.arange(k, dtype=np.int32)
                nxt = np.roll(idx, -1)
                F = np.concatenate(
                    [
                        np.stack([idx, nxt, idx + k], -1),
                        np.stack([nxt, nxt + k, idx + k], -1),
                    ]
                ).astype(np.int32)
                u = np.concatenate([ang, ang]) / (2 * np.pi)
                v = np.concatenate([np.zeros(k), np.ones(k)])
                UV = np.stack([u, v], -1).astype(np.float32)
                mm = np.asarray(to_world.m)
                Vw = (mm[:3, :3] @ V.T + mm[:3, 3:4]).T.astype(np.float32)
                Nw = (np.linalg.inv(mm[:3, :3]).T @ N.T).T
                Nw = (Nw / np.linalg.norm(Nw, axis=-1, keepdims=True)).astype(np.float32)
                tri_meshes.append(
                    {"vertices": Vw, "faces": F, "normals": Nw, "uvs": UV,
                     "shape_index": shape_index}
                )
            elif t == "serialized":
                m = _load_serialized(
                    _rfile(spec["filename"]), int(spec.get("shape_index", 0)), to_world
                )
                m["shape_index"] = shape_index
                tri_meshes.append(m)
            elif t == "disk":
                # approximate as a triangle fan (analytic disk later)
                k = 64
                ang = np.linspace(0, 2 * np.pi, k, endpoint=False)
                V = np.concatenate(
                    [np.zeros((1, 3), np.float32),
                     np.stack([np.cos(ang), np.sin(ang), np.zeros(k)], -1).astype(np.float32)]
                )
                F = np.stack(
                    [np.zeros(k, np.int32), np.arange(1, k + 1, dtype=np.int32),
                     np.roll(np.arange(1, k + 1, dtype=np.int32), -1)], -1
                )
                mm = np.asarray(to_world.m)
                Vw = (mm[:3, :3] @ V.T + mm[:3, 3:4]).T
                tri_meshes.append(
                    {"vertices": Vw.astype(np.float32), "faces": F, "shape_index": shape_index}
                )
            # per-vertex attribute tables (consumed by mesh_attribute
            # textures; reference: Mesh::add_attribute, mesh_attribute.cpp)
            if "attributes" in spec and tri_meshes and \
                    tri_meshes[-1].get("shape_index") == shape_index:
                tri_meshes[-1]["attributes"] = spec["attributes"]
            rec = {
                "name": name,
                "bsdf": resolve_bsdf(spec.get("bsdf"), name),
                "emitter": -1,
                "interior": resolve_medium(spec.get("interior"), f"{name}.interior_medium"),
                "exterior": resolve_medium(spec.get("exterior"), f"{name}.exterior_medium"),
            }
            if "emitter" in spec:
                shape_emitter_specs.append((shape_index, spec["emitter"], name))
            shape_records.append(rec)
        elif t == "sampler":
            spp = int(spec.get("sample_count", spp))
        elif t is not None:
            # unknown top-level plugin: fail loudly like the reference's
            # PluginManager (plugin.cpp "Plugin ... not found") instead of
            # silently dropping scene content
            raise ValueError(
                f"scene entry {name!r}: unknown plugin type {t!r}"
            )

    if sensor is None:
        sensor = SEN.PerspectiveCamera(
            to_world_m=Transform.identity().m,
            tan_half_fov_x=jnp.asarray(np.tan(np.deg2rad(45.0 / 2)), jnp.float32),
            aspect=1.0,
        )
        film = Film(width=64, height=64)

    geometry = SH.build_geometry(tri_meshes, spheres, sdf_shapes, capsules)

    # fill mesh_attribute texture placeholders now that global triangle
    # offsets are known (reference: mesh_attribute.cpp reads the attribute
    # of the hit mesh at (prim_index, prim_uv))
    bsdf_list = _patch_mesh_attributes(bsdf_list, shape_records, tri_meshes)

    # per-shape differentiable vertex views (reference: mesh vertex_positions,
    # Differentiable|Discontinuous, src/render/mesh.cpp:84-91)
    for mesh, (v_start, v_count) in zip(tri_meshes, geometry.mesh_vertex_slices):
        sname = shape_records[mesh["shape_index"]]["name"]
        param_paths.append(
            (
                f"{sname}.vertex_positions",
                ("geometry", "vertices", ("slice", v_start, v_start + v_count)),
            )
        )

    # bbox from geometry
    pts = [np.asarray(geometry.tri_v0), np.asarray(geometry.tri_v0 + geometry.tri_e1),
           np.asarray(geometry.tri_v0 + geometry.tri_e2)]
    allp = np.concatenate(pts, 0)
    valid_tris = np.asarray(geometry.tri_shape) >= 0
    vmask = np.concatenate([valid_tris] * 3)
    if vmask.any():
        bbox_min = allp[vmask].min(0)
        bbox_max = allp[vmask].max(0)
    else:
        bbox_min = np.full(3, -1.0, np.float32)
        bbox_max = np.full(3, 1.0, np.float32)
    if spheres:
        sc = np.stack([s["center"] for s in spheres])
        sr = np.asarray([s["radius"] for s in spheres])
        bbox_min = np.minimum(bbox_min, (sc - sr[:, None]).min(0))
        bbox_max = np.maximum(bbox_max, (sc + sr[:, None]).max(0))
    if capsules:
        cp = np.concatenate(
            [np.stack([c["a"] for c in capsules]),
             np.stack([c["b"] for c in capsules])]
        )
        cr = np.concatenate([[c["r"] for c in capsules]] * 2).reshape(-1, 1)
        bbox_min = np.minimum(bbox_min, (cp - cr).min(0))
        bbox_max = np.maximum(bbox_max, (cp + cr).max(0))
    radius = 0.5 * float(np.linalg.norm(bbox_max - bbox_min)) or 1.0

    # area emitters: build per-emitter triangle CDFs
    emitters = []
    env_emitter = -1
    tri_shape_np = np.asarray(geometry.tri_shape)
    tri_e1_np = np.asarray(geometry.tri_e1)
    tri_e2_np = np.asarray(geometry.tri_e2)
    sphere_by_shape = {s["shape_index"]: i for i, s in enumerate(spheres)}
    for shape_index, em_spec, shape_name in shape_emitter_specs:
        tex, leaf = parse_texture(em_spec.get("radiance", 1.0), emissive=True)
        if shape_index in sphere_by_shape:
            # analytic sphere light: exact cone sampling instead of a
            # triangle CDF (reference: sphere.cpp sample_direction)
            s_i = sphere_by_shape[shape_index]
            e_idx = len(emitters)
            emitters.append(
                E.SphereAreaEmitter(
                    radiance=tex,
                    sphere_index=s_i,
                    shape_index=shape_index,
                )
            )
            param_paths.append(
                (f"{shape_name}.emitter.radiance.{leaf}",
                 ("emitters", e_idx, "radiance", leaf))
            )
            shape_records[shape_index]["emitter"] = e_idx
            continue
        tri_idx = np.nonzero(tri_shape_np == shape_index)[0].astype(np.int32)
        areas = 0.5 * np.linalg.norm(
            np.cross(tri_e1_np[tri_idx], tri_e2_np[tri_idx]), axis=-1
        )
        cdf = np.cumsum(areas).astype(np.float32)
        e_idx = len(emitters)
        em_cls = (
            E.DirectionalAreaEmitter
            if em_spec.get("type") == "directionalarea"
            else E.AreaEmitter
        )
        emitters.append(
            em_cls(
                radiance=tex, shape_index=shape_index,
                tri_index=jnp.asarray(tri_idx), tri_cdf=jnp.asarray(cdf),
                total_area=jnp.asarray(cdf[-1] if len(cdf) else 0.0, jnp.float32),
            )
        )
        param_paths.append(
            (f"{shape_name}.emitter.radiance.{leaf}", ("emitters", e_idx, "radiance", leaf))
        )
        shape_records[shape_index]["emitter"] = e_idx

    # many-light fast path: fuse >4 constant-radiance mesh area lights into
    # one SoA AreaEmitterArray (see its docstring) — NEE cost becomes O(1)
    # in the light count (reference vcall dispatch analog: scene.cpp:299-353)
    area_idx = [
        i for i, em in enumerate(emitters)
        if type(em) is E.AreaEmitter and type(em.radiance) is TX.ConstantTexture
        and em.tri_index.shape[0] > 0
    ]
    do_fuse_area = (len(area_idx) > 4) if fuse_area_lights is None else (
        fuse_area_lights and len(area_idx) > 1
    )
    if do_fuse_area:
        fused_set = set(area_idx)
        remap = {}
        new_emitters = []
        for i, em in enumerate(emitters):
            if i in fused_set:
                continue
            remap[i] = len(new_emitters)
            new_emitters.append(em)
        g_idx = len(new_emitters)

        values, tri_ids, tri_light, tri_w, lums = [], [], [], [], []
        shape_to_light = np.full(max(len(shape_records), 1), -1, np.int32)
        for k, i in enumerate(area_idx):
            em = emitters[i]
            v = np.asarray(em.radiance.value, np.float32)
            v3 = np.repeat(v, 3) if v.shape == (1,) else v
            values.append(v3)
            lum = max(float(v3.mean()), 1e-12)
            lums.append(lum)
            cdf = np.asarray(em.tri_cdf, np.float32)
            areas = np.diff(np.concatenate([[0.0], cdf]))
            tri_ids.append(np.asarray(em.tri_index, np.int32))
            tri_light.append(np.full(areas.shape[0], k, np.int32))
            tri_w.append(areas * lum)
            shape_to_light[em.shape_index] = k
        w = np.concatenate(tri_w)
        Z = max(float(w.sum()), 1e-30)
        new_emitters.append(
            E.AreaEmitterArray(
                values=jnp.asarray(np.stack(values)),
                tri_index=jnp.asarray(np.concatenate(tri_ids)),
                tri_light=jnp.asarray(np.concatenate(tri_light)),
                tri_cdf=jnp.asarray(np.cumsum(w) / Z, jnp.float32),
                area_pdf=jnp.asarray(np.asarray(lums) / Z, jnp.float32),
                shape_to_light=jnp.asarray(shape_to_light),
                total_power=jnp.asarray(np.pi * Z, jnp.float32),
            )
        )
        # remap per-shape emitter slots and existing parameter paths
        inv_area = {i: k for k, i in enumerate(area_idx)}
        for rec in shape_records:
            e = rec["emitter"]
            if e < 0:
                continue
            rec["emitter"] = g_idx if e in fused_set else remap[e]
        new_paths = []
        for key, path in param_paths:
            if path and path[0] == "emitters":
                old = path[1]
                if old in fused_set:
                    k = inv_area[old]
                    path = ("emitters", g_idx, "values", ("slice", k, k + 1))
                else:
                    path = ("emitters", remap[old]) + tuple(path[2:])
            new_paths.append((key, path))
        param_paths = new_paths
        emitters = new_emitters

    # many-light fast path: fuse >4 constant-intensity point lights into one
    # SoA PointEmitterArray (see emitters.PointEmitterArray docstring)
    def _bakeable_point(spec):
        if spec["type"] != "point":
            return None
        i = spec.get("intensity", 1.0)
        if isinstance(i, (int, float)):
            return [float(i)] * 3
        if isinstance(i, (list, tuple)) and len(i) in (1, 3):
            v = [float(x) for x in i]
            return v * 3 if len(v) == 1 else v
        if isinstance(i, dict) and i.get("type") in ("rgb", "uniform"):
            v = i.get("value", 1.0)
            return [float(v)] * 3 if isinstance(v, (int, float)) else [float(x) for x in v]
        return None

    point_group = [
        (name, spec, _bakeable_point(spec))
        for kind, name, spec in emitter_list
        if spec["type"] == "point" and _bakeable_point(spec) is not None
    ]
    do_fuse = (len(point_group) > 4) if fuse_point_lights is None else (
        fuse_point_lights and len(point_group) > 0
    )
    if do_fuse:
        grouped_names = {n for n, _, _ in point_group}
        emitter_list = [e for e in emitter_list if e[1] not in grouped_names]
        pos_rows, val_rows = [], []
        for name, spec, val in point_group:
            p = spec.get("position", [0, 0, 0])
            if "to_world" in spec:
                p = np.asarray(build_transform(spec["to_world"]).m)[:3, 3]
            pos_rows.append(np.asarray(p, np.float32))
            val_rows.append(np.asarray(val, np.float32))
        e_idx = len(emitters)
        emitters.append(
            E.PointEmitterArray(
                values=jnp.asarray(np.stack(val_rows)),
                positions=jnp.asarray(np.stack(pos_rows)),
            )
        )
        param_paths.append(("point_lights.values", ("emitters", e_idx, "values")))

    for kind, name, spec in emitter_list:
        t = spec["type"]
        e_idx = len(emitters)
        if t == "constant":
            tex, leaf = parse_texture(spec.get("radiance", 1.0), emissive=True)
            emitters.append(
                E.ConstantEmitter(radiance=tex, scene_radius=jnp.asarray(radius, jnp.float32))
            )
            env_emitter = e_idx
            param_paths.append((f"{name}.radiance.{leaf}", ("emitters", e_idx, "radiance", leaf)))
        elif t == "envmap":
            if "data" in spec:
                data = np.asarray(spec["data"], np.float32)
            else:
                data = _load_image(_rfile(spec["filename"])).astype(np.float32)
            row_cdf, cond_cdf = E.build_envmap_tables(data, 1.0)
            rot = np.asarray(build_transform(spec.get("to_world", Transform.identity())).m)[:3, :3]
            emitters.append(
                E.EnvmapEmitter(
                    data=jnp.asarray(data), row_cdf=row_cdf, cond_cdf=cond_cdf,
                    scale=jnp.asarray(float(spec.get("scale", 1.0)), jnp.float32),
                    scene_radius=jnp.asarray(radius, jnp.float32),
                    to_world_rot=jnp.asarray(rot, jnp.float32),
                )
            )
            env_emitter = e_idx
            param_paths.append((f"{name}.data", ("emitters", e_idx, "data")))
        elif t == "point":
            tex, leaf = parse_texture(spec.get("intensity", 1.0), emissive=True)
            pos = spec.get("position", [0, 0, 0])
            if "to_world" in spec:
                m = np.asarray(build_transform(spec["to_world"]).m)
                pos = m[:3, 3]
            emitters.append(
                E.PointEmitter(intensity=tex, position=jnp.asarray(pos, jnp.float32))
            )
            param_paths.append((f"{name}.intensity.{leaf}", ("emitters", e_idx, "intensity", leaf)))
        elif t == "directional":
            tex, leaf = parse_texture(spec.get("irradiance", 1.0), emissive=True)
            dirn = np.asarray(spec.get("direction", [0, 0, -1]), np.float32)
            emitters.append(
                E.DirectionalEmitter(
                    irradiance=tex,
                    direction=jnp.asarray(dirn / np.linalg.norm(dirn)),
                    scene_radius=jnp.asarray(radius, jnp.float32),
                )
            )
            param_paths.append((f"{name}.irradiance.{leaf}", ("emitters", e_idx, "irradiance", leaf)))
        elif t == "projector":
            tex, leaf = parse_texture(spec.get("irradiance", 1.0), emissive=True)
            m = np.asarray(build_transform(spec.get("to_world", Transform.identity())).m)
            fov = float(spec.get("fov", 45.0))
            emitters.append(
                E.ProjectorEmitter(
                    irradiance=tex,
                    scale=jnp.asarray(float(spec.get("scale", 1.0)), jnp.float32),
                    position=jnp.asarray(m[:3, 3], jnp.float32),
                    to_world_r=jnp.asarray(m[:3, :3], jnp.float32),
                    tan_half_fov_x=jnp.asarray(np.tan(np.deg2rad(fov) / 2), jnp.float32),
                    aspect=1.0,
                )
            )
            param_paths.append((f"{name}.irradiance.{leaf}", ("emitters", e_idx, "irradiance", leaf)))
        elif t == "spot":
            tex, leaf = parse_texture(spec.get("intensity", 1.0), emissive=True)
            m = np.asarray(build_transform(spec.get("to_world", Transform.identity())).m)
            cutoff = np.deg2rad(float(spec.get("cutoff_angle", 20.0)))
            beam = np.deg2rad(float(spec.get("beam_width", cutoff * 0.75)))
            emitters.append(
                E.SpotEmitter(
                    intensity=tex, position=jnp.asarray(m[:3, 3], jnp.float32),
                    direction=jnp.asarray(m[:3, 2], jnp.float32),
                    cos_cutoff=jnp.asarray(np.cos(cutoff), jnp.float32),
                    cos_beam_width=jnp.asarray(np.cos(beam), jnp.float32),
                )
            )
            param_paths.append((f"{name}.intensity.{leaf}", ("emitters", e_idx, "intensity", leaf)))

    n_shapes = max(len(shape_records), 1)
    shape_bsdf = np.zeros(n_shapes, np.int32)
    shape_emitter = np.full(n_shapes, -1, np.int32)
    shape_int_med = np.full(n_shapes, -1, np.int32)
    shape_ext_med = np.full(n_shapes, -1, np.int32)
    for i, rec in enumerate(shape_records):
        shape_bsdf[i] = rec["bsdf"]
        shape_emitter[i] = rec["emitter"]
        shape_int_med[i] = rec["interior"]
        shape_ext_med[i] = rec["exterior"]

    if not bsdf_list:
        bsdf_list.append(B.DiffuseBSDF(reflectance=TX.ConstantTexture(value=jnp.asarray([0.5], jnp.float32))))

    integrator = make_integrator(integrator_spec)

    if geometry.has_bvh:
        # tiled lane order: compact per-block pixel footprints for the
        # block-shared BVH traversal kernel (see Film.tiled)
        film = film.replace(tiled=True)

    emitter_pmf = None
    if emitter_sampler == "power" and len(emitters) > 1:
        emitter_pmf = jnp.asarray(
            [_emitter_power(em, radius, geometry) for em in emitters], jnp.float32
        )

    scene = Scene(
        geometry=geometry,
        bsdfs=tuple(bsdf_list),
        emitters=tuple(emitters),
        sensors=(sensor,),
        media=tuple(media_list),
        phases=tuple(phase_list),
        integrator=integrator,
        film=film,
        shape_bsdf=jnp.asarray(shape_bsdf),
        shape_emitter=jnp.asarray(shape_emitter),
        shape_interior_medium=jnp.asarray(shape_int_med),
        shape_exterior_medium=jnp.asarray(shape_ext_med),
        bbox_min=jnp.asarray(bbox_min, jnp.float32),
        bbox_max=jnp.asarray(bbox_max, jnp.float32),
        spp=spp,
        env_emitter=env_emitter,
        n_channels=var.n_channels,
        polarized=var.polarized,
        sampler_type=sampler_type,
        param_paths=tuple(param_paths),
        emitter_pmf=emitter_pmf,
    )
    return scene


def _patch_mesh_attributes(bsdf_list, shape_records, tri_meshes):
    """Replace MeshAttributeTexture placeholders (prim_offset == -1) with the
    owning mesh's per-vertex data gathered per (triangle, corner), plus the
    mesh's global triangle offset in the concatenated SoA table."""
    import dataclasses

    # global face offset per tri_meshes entry (build_geometry concat order)
    offsets = {}
    off = 0
    for m in tri_meshes:
        offsets[id(m)] = off
        off += int(np.asarray(m["faces"]).shape[0])

    def mesh_for_bsdf(b_idx, attr_name):
        for si_, rec in enumerate(shape_records):
            if rec["bsdf"] != b_idx:
                continue
            for m in tri_meshes:
                if m.get("shape_index") == si_ and attr_name in (m.get("attributes") or {}):
                    return m
        return None

    out = []
    for b_idx, b in enumerate(bsdf_list):
        if not dataclasses.is_dataclass(b):
            out.append(b)
            continue
        reps = {}
        for f in dataclasses.fields(b):
            tex = getattr(b, f.name, None)
            if isinstance(tex, TX.MeshAttributeTexture) and tex.prim_offset == -1:
                m = mesh_for_bsdf(b_idx, tex.name)
                if m is None:
                    raise ValueError(
                        f"mesh_attribute texture {tex.name!r}: no mesh with "
                        "that attribute uses this BSDF"
                    )
                attr = np.asarray(m["attributes"][tex.name], np.float32)
                if attr.ndim == 1:
                    attr = attr[:, None]
                F = np.asarray(m["faces"], np.int32)
                values3 = attr[F]                      # [F, 3, C]
                reps[f.name] = TX.MeshAttributeTexture(
                    values3=jnp.asarray(values3),
                    prim_offset=offsets[id(m)],
                    name=tex.name,
                )
        out.append(b.replace(**reps) if reps else b)
    return out


def _emitter_power(em, scene_radius, geometry=None):
    """Relative power heuristic for emitter selection weights (reference:
    scene.cpp:238-250 builds its DiscreteDistribution from sampling weights).
    Absolute scale is irrelevant — only ratios matter."""
    import numpy as np

    def tex_mean(tex):
        v = getattr(tex, "value", None)
        if v is None:
            return 1.0
        return float(np.mean(np.asarray(v)))

    r = float(scene_radius)
    if isinstance(em, E.PointEmitterArray):
        return 4.0 * np.pi * float(np.sum(np.mean(np.asarray(em.values), axis=-1)))
    if isinstance(em, (E.AreaEmitter, E.DirectionalAreaEmitter)):
        return float(np.pi * float(em.total_area) * tex_mean(em.radiance))
    if isinstance(em, E.AreaEmitterArray):
        return float(em.total_power)
    if isinstance(em, E.SphereAreaEmitter):
        r_s = float(np.asarray(geometry.sph_radius)[em.sphere_index]) if geometry is not None else 1.0
        area = 4.0 * np.pi * r_s ** 2
        return float(np.pi * area * tex_mean(em.radiance))
    if isinstance(em, E.PointEmitter):
        return 4.0 * np.pi * tex_mean(em.intensity)
    if isinstance(em, E.ConstantEmitter):
        return 4.0 * np.pi**2 * r * r * tex_mean(em.radiance)
    if isinstance(em, E.EnvmapEmitter):
        lum = np.asarray(em.data).mean() * float(em.scale)
        return 4.0 * np.pi**2 * r * r * float(lum)
    if isinstance(em, E.DirectionalEmitter):
        return float(np.pi * r * r * tex_mean(em.irradiance))
    if isinstance(em, E.SpotEmitter):
        solid = 2.0 * np.pi * (1.0 - float(em.cos_cutoff))
        return solid * tex_mean(em.intensity)
    if isinstance(em, E.ProjectorEmitter):
        return float(np.pi * tex_mean(em.irradiance) * float(em.scale))
    return 1.0


def _load_mesh_native(kind, filename, to_world):
    """Load obj/ply via the native C++ parsers (native/src/mesh_io.cpp),
    falling back to the python OBJ reader."""
    try:
        from .. import native as native_mod

        m = native_mod.load_obj(filename) if kind == "obj" else native_mod.load_ply(filename)
    except Exception:
        if kind != "obj":
            raise
        return SH.load_obj(filename, to_world)
    mm = np.asarray(to_world.m)
    V = m["vertices"]
    out = {"vertices": (mm[:3, :3] @ V.T + mm[:3, 3:4]).T.astype(np.float32),
           "faces": m["faces"]}
    if "normals" in m:
        Nw = (np.asarray(to_world.inv)[:3, :3].T @ m["normals"].T).T
        Nw /= np.maximum(np.linalg.norm(Nw, axis=-1, keepdims=True), 1e-12)
        out["normals"] = Nw.astype(np.float32)
    if "uvs" in m:
        out["uvs"] = m["uvs"]
    return out


def _medium_ref(spec):
    if isinstance(spec, dict) and spec.get("type") == "ref":
        return spec["id"]
    return None


def _load_serialized(filename, sub_index, to_world):
    """Mitsuba .serialized mesh reader (reference: src/shapes/serialized.cpp
    format: per-mesh [u16 magic 0x041C, u16 version, zlib stream]; file ends
    with u64 offsets x count + u32 count; stream = u32 flags, name (v>=4),
    u64 nverts, u64 nfaces, positions, [normals], [uvs], [colors], u32 faces).
    """
    import zlib
    import struct as pystruct

    with open(filename, "rb") as f:
        data = f.read()
    (count,) = pystruct.unpack_from("<I", data, len(data) - 4)
    offsets = pystruct.unpack_from(
        f"<{count}Q", data, len(data) - 4 - 8 * count
    )
    if not (0 <= sub_index < count):
        raise ValueError(
            f"shape_index {sub_index} out of range ({count} meshes in {filename!r})"
        )
    off = offsets[sub_index]
    magic, version = pystruct.unpack_from("<HH", data, off)
    if magic != 0x041C:
        raise ValueError(f"bad .serialized magic {magic:#x} in {filename!r}")
    end = offsets[sub_index + 1] if sub_index + 1 < count else len(data) - 4 - 8 * count
    raw = zlib.decompress(data[off + 4:end])

    pos = 0
    (flags,) = pystruct.unpack_from("<I", raw, pos); pos += 4
    if version >= 4:
        nul = raw.index(b"\x00", pos)
        pos = nul + 1
    nv, nf = pystruct.unpack_from("<QQ", raw, pos); pos += 16
    double = bool(flags & 0x2000)
    ftype, fsize = ("<f8", 8) if double else ("<f4", 4)

    def take(n):
        nonlocal pos
        a = np.frombuffer(raw, ftype, count=n, offset=pos).astype(np.float32)
        pos += n * fsize
        return a

    V = take(3 * nv).reshape(nv, 3)
    N = take(3 * nv).reshape(nv, 3) if flags & 0x0001 else None
    UV = take(2 * nv).reshape(nv, 2) if flags & 0x0002 else None
    if flags & 0x0008:
        take(3 * nv)                       # vertex colors: parsed, unused
    F = np.frombuffer(raw, "<u4", count=3 * nf, offset=pos).reshape(nf, 3)
    F = F.astype(np.int32)

    mm = np.asarray(to_world.m)
    Vw = (mm[:3, :3] @ V.T + mm[:3, 3:4]).T.astype(np.float32)
    out = {"vertices": Vw, "faces": F}
    if N is not None:
        Nw = (np.linalg.inv(mm[:3, :3]).T @ N.T).T
        nrm = np.linalg.norm(Nw, axis=-1, keepdims=True)
        out["normals"] = (Nw / np.maximum(nrm, 1e-12)).astype(np.float32)
    if UV is not None:
        out["uvs"] = UV.astype(np.float32)
    return out


def parse_sensor(spec):
    spec = _expand_registered("sensor", spec)
    t = spec["type"]
    film_spec = _expand_registered("film", spec.get("film", {}))
    w = int(film_spec.get("width", 768))
    h = int(film_spec.get("height", 576))
    rfilter = _expand_registered("rfilter", film_spec.get("rfilter", {"type": "gaussian"}))
    rf_type = rfilter["type"] if isinstance(rfilter, dict) else str(rfilter)
    srfs = ()
    if film_spec.get("type") == "specfilm":
        # nested spectra are the per-channel sensor response functions
        # (reference: src/films/specfilm.cpp)
        srfs = tuple(
            parse_texture(v)[0]
            for k, v in film_spec.items()
            if isinstance(v, dict)
            and v.get("type") in ("regular", "irregular", "uniform", "d65")
        )
        if not srfs:
            raise ValueError("specfilm needs at least one nested spectrum (SRF)")
    srf_norms = ()
    if srfs:
        lam = jnp.linspace(360.0, 830.0, 512)
        uv0 = jnp.zeros((512, 2), jnp.float32)
        srf_norms = tuple(
            float(jnp.trapezoid(srf.eval(uv0, lam[:, None], 1)[:, 0], lam))
            for srf in srfs
        )
    crop_offset = (
        int(film_spec.get("crop_offset_x", 0)),
        int(film_spec.get("crop_offset_y", 0)),
    )
    crop_size = None
    if "crop_width" in film_spec or "crop_height" in film_spec:
        crop_size = (
            int(film_spec.get("crop_width", w)),
            int(film_spec.get("crop_height", h)),
        )
    film = Film(
        width=w, height=h, rfilter=rf_type, crop_offset=crop_offset,
        crop_size=crop_size, srfs=srfs, srf_norms=srf_norms,
    )
    sampler_spec = _expand_registered("sampler", spec.get("sampler", {}))
    spp = int(sampler_spec.get("sample_count", 16))
    sampler_type = str(sampler_spec.get("type", "independent"))
    to_world = build_transform(spec.get("to_world", Transform.identity()))
    aspect = w / h

    if t in ("perspective", "thinlens"):
        fov = float(spec.get("fov", 45.0))
        fov_axis = spec.get("fov_axis", "x")
        tan_half = np.tan(np.deg2rad(fov) / 2)
        # convert the named-axis fov to the x-axis fov we store
        # (reference: src/render/sensor.cpp parse_fov); tan_y = tan_x / aspect
        if fov_axis == "y" or (fov_axis == "smaller" and aspect >= 1.0) or (
            fov_axis == "larger" and aspect < 1.0
        ):
            tan_half = tan_half * aspect
        if t == "perspective":
            cam = SEN.PerspectiveCamera(
                to_world_m=to_world.m,
                tan_half_fov_x=jnp.asarray(tan_half, jnp.float32),
                aspect=aspect,
            )
        else:
            cam = SEN.ThinLensCamera(
                to_world_m=to_world.m,
                tan_half_fov_x=jnp.asarray(tan_half, jnp.float32),
                aperture_radius=jnp.asarray(float(spec.get("aperture_radius", 0.1)), jnp.float32),
                focus_distance=jnp.asarray(float(spec.get("focus_distance", 1.0)), jnp.float32),
                aspect=aspect,
            )
    elif t == "orthographic":
        cam = SEN.OrthographicCamera(to_world_m=to_world.m, aspect=aspect)
    elif t == "radiancemeter":
        wl = float(spec.get("wavelength", -1.0))
        cam = SEN.RadiancemeterSensor(
            to_world_m=to_world.m, wavelength=jnp.asarray(wl, jnp.float32), aspect=aspect
        )
    elif t == "irradiancemeter":
        cam = SEN.IrradiancemeterSensor(to_world_m=to_world.m, aspect=aspect)
    elif t == "distant":
        dirn = np.asarray(spec.get("direction", [0, 0, -1]), np.float32)
        target = spec.get("target")
        wl = float(spec.get("wavelength", -1.0))
        cam = SEN.DistantSensor(
            direction=jnp.asarray(dirn / np.linalg.norm(dirn)),
            target=jnp.asarray(target if target is not None else [0, 0, 0], jnp.float32),
            scene_center=jnp.zeros(3, jnp.float32),
            scene_radius=jnp.asarray(1.0, jnp.float32),
            wavelength=jnp.asarray(wl, jnp.float32),
            has_target=target is not None,
        )
    elif t == "batch":
        sub_specs = []
        for v in spec.values():
            if isinstance(v, dict) and v.get("type") in SENSOR_TYPES:
                sub_specs.append(v)
            elif isinstance(v, (list, tuple)):  # list-valued child shorthand
                sub_specs.extend(
                    s for s in v
                    if isinstance(s, dict) and s.get("type") in SENSOR_TYPES
                )
        nested = [parse_sensor(v)[0] for v in sub_specs]
        if not nested:
            raise ValueError("batch sensor needs nested sensors")
        cam = SEN.BatchSensor(sensors=tuple(nested))
    else:
        raise ValueError(f"unknown sensor type {t!r}")
    return cam, film, spp, sampler_type


def load_file(path, **defaults):
    """Load a Mitsuba XML scene file (reference: xml::load_file,
    src/core/xml.cpp) by translating to the dict format."""
    from ..xml import load_xml_dict

    return load_dict(load_xml_dict(path, **defaults))


def cornell_box():
    """The canonical Cornell box scene dict
    (mirrors mi.cornell_box, reference: util.py:757-891)."""
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 8},
        "sensor": {
            "type": "perspective",
            "fov_axis": "smaller",
            "near_clip": 0.001,
            "far_clip": 100.0,
            "focus_distance": 1000,
            "fov": 39.3077,
            "to_world": [
                {"type": "look_at", "origin": [0, 0, 3.90], "target": [0, 0, 0], "up": [0, 1, 0]}
            ],
            "sampler": {"type": "independent", "sample_count": 64},
            "film": {
                "type": "hdrfilm",
                "width": 256,
                "height": 256,
                "rfilter": {"type": "gaussian"},
                "pixel_format": "rgb",
                "component_format": "float32",
            },
        },
        "white": {"type": "diffuse", "reflectance": {"type": "rgb", "value": [0.885809, 0.698859, 0.666422]}},
        "green": {"type": "diffuse", "reflectance": {"type": "rgb", "value": [0.105421, 0.37798, 0.076425]}},
        "red": {"type": "diffuse", "reflectance": {"type": "rgb", "value": [0.570068, 0.0430135, 0.0443706]}},
        "light": {
            "type": "rectangle",
            "to_world": [
                {"type": "scale", "value": [0.23, 0.19, 0.19]},
                {"type": "rotate", "axis": [1, 0, 0], "angle": 90},
                {"type": "translate", "value": [0.0, 0.99, 0.01]},
            ],
            "bsdf": {"type": "ref", "id": "white"},
            "emitter": {"type": "area", "radiance": {"type": "rgb", "value": [18.387, 13.9873, 6.75357]}},
        },
        "floor": {
            "type": "rectangle",
            "to_world": [
                {"type": "rotate", "axis": [1, 0, 0], "angle": -90},
                {"type": "translate", "value": [0.0, -1.0, 0.0]},
            ],
            "bsdf": {"type": "ref", "id": "white"},
        },
        "ceiling": {
            "type": "rectangle",
            "to_world": [
                {"type": "rotate", "axis": [1, 0, 0], "angle": 90},
                {"type": "translate", "value": [0.0, 1.0, 0.0]},
            ],
            "bsdf": {"type": "ref", "id": "white"},
        },
        "back": {
            "type": "rectangle",
            "to_world": [{"type": "translate", "value": [0.0, 0.0, -1.0]}],
            "bsdf": {"type": "ref", "id": "white"},
        },
        "green-wall": {
            "type": "rectangle",
            "to_world": [
                {"type": "rotate", "axis": [0, 1, 0], "angle": -90},
                {"type": "translate", "value": [1.0, 0.0, 0.0]},
            ],
            "bsdf": {"type": "ref", "id": "green"},
        },
        "red-wall": {
            "type": "rectangle",
            "to_world": [
                {"type": "rotate", "axis": [0, 1, 0], "angle": 90},
                {"type": "translate", "value": [-1.0, 0.0, 0.0]},
            ],
            "bsdf": {"type": "ref", "id": "red"},
        },
        "small-box": {
            "type": "cube",
            "to_world": [
                {"type": "scale", "value": 0.3},
                {"type": "rotate", "axis": [0, 1, 0], "angle": -17},
                {"type": "translate", "value": [0.335, -0.7, 0.38]},
            ],
            "bsdf": {"type": "ref", "id": "white"},
        },
        "large-box": {
            "type": "cube",
            "to_world": [
                {"type": "scale", "value": [0.3, 0.61, 0.3]},
                {"type": "rotate", "axis": [0, 1, 0], "angle": 18.25},
                {"type": "translate", "value": [-0.33, -0.4, -0.28]},
            ],
            "bsdf": {"type": "ref", "id": "white"},
        },
    }
