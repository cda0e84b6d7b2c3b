"""Mitsuba XML scene loader + dict->XML writer
(reference: src/core/xml.cpp, 1413 LoC and src/python/python/xml.py, 739 LoC).

load_xml parses the Mitsuba 3 XML vocabulary (plugin tags with nested
float/integer/boolean/string/rgb/spectrum/ref/transform properties, $default
substitution, version attribute ignored) into the scene-dict format consumed
by load_dict."""
from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

_PLUGIN_TAGS = {
    "integrator", "sensor", "shape", "bsdf", "emitter", "medium", "phase",
    "texture", "spectrum", "film", "sampler", "rfilter", "volume",
    "sizedistr",
}


def _parse_value(text, defaults):
    if isinstance(text, str) and "$" in text:
        for k, v in defaults.items():
            text = text.replace(f"${k}", str(v))
    return text


def _parse_vec(text):
    parts = re.split(r"[,\s]+", text.strip())
    vals = [float(p) for p in parts if p]
    return vals[0] if len(vals) == 1 else vals


def _parse_transform(node, defaults):
    ops = []
    for child in node:
        tag = child.tag
        if tag == "translate":
            ops.append({"type": "translate", "value": _xyz(child, 0.0)})
        elif tag == "scale":
            if child.get("value") is not None:
                ops.append({"type": "scale", "value": _parse_vec(_parse_value(child.get("value"), defaults))})
            else:
                ops.append({"type": "scale", "value": _xyz(child, 1.0)})
        elif tag == "rotate":
            axis = _xyz(child, 0.0)
            ops.append({"type": "rotate", "axis": axis, "angle": float(_parse_value(child.get("angle"), defaults))})
        elif tag in ("lookat", "look_at"):
            ops.append({
                "type": "look_at",
                "origin": _parse_vec(_parse_value(child.get("origin"), defaults)),
                "target": _parse_vec(_parse_value(child.get("target"), defaults)),
                "up": _parse_vec(_parse_value(child.get("up", "0, 1, 0"), defaults)),
            })
        elif tag == "matrix":
            vals = _parse_vec(_parse_value(child.get("value"), defaults))
            m = [vals[i * 4:(i + 1) * 4] for i in range(4)]
            ops.append({"type": "matrix", "value": m})
    return ops


def _xyz(node, default):
    if node.get("value") is not None:
        return _parse_vec(node.get("value"))
    return [
        float(node.get("x", default)),
        float(node.get("y", default)),
        float(node.get("z", default)),
    ]


def _node_to_dict(node, defaults, base_dir):
    d = {"type": node.get("type", node.tag)}
    anon = 0
    for child in node:
        tag = child.tag
        name = child.get("name")
        if tag == "float":
            d[name] = float(_parse_value(child.get("value"), defaults))
        elif tag == "integer":
            d[name] = int(float(_parse_value(child.get("value"), defaults)))
        elif tag == "boolean":
            d[name] = str(_parse_value(child.get("value"), defaults)).lower() == "true"
        elif tag == "string":
            val = _parse_value(child.get("value"), defaults)
            if name == "filename" and not os.path.isabs(val):
                cand = os.path.join(base_dir, val)
                if os.path.exists(cand):
                    val = cand
                else:
                    # fall back to the resolver's search paths (reference:
                    # fresolver.cpp; CLI -a appends entries)
                    from .core.fresolver import file_resolver

                    val = file_resolver().resolve(val)
            d[name] = val
        elif tag in ("point", "vector"):
            d[name] = _xyz(child, 0.0)
        elif tag == "rgb":
            d[name] = {"type": "rgb", "value": _parse_vec(_parse_value(child.get("value"), defaults))}
        elif tag == "spectrum":
            val = _parse_value(child.get("value"), defaults)
            try:
                d[name] = {"type": "uniform", "value": float(val)}
            except (TypeError, ValueError):
                pairs = [p.split(":") for p in re.split(r"[,\s]+", val) if ":" in p]
                d[name] = {
                    "type": "irregular",
                    "wavelengths": [float(a) for a, _ in pairs],
                    "values": [float(b) for _, b in pairs],
                }
        elif tag == "transform":
            d[name or "to_world"] = _parse_transform(child, defaults)
        elif tag == "ref":
            key = name or f"ref{anon}"
            anon += 1
            d[key] = {"type": "ref", "id": child.get("id")}
        elif tag == "default":
            defaults.setdefault(child.get("name"), child.get("value"))
        elif tag in _PLUGIN_TAGS:
            key = name or child.get("id") or child.tag
            if key in d:
                key = f"{key}_{anon}"
                anon += 1
            d[key] = _node_to_dict(child, defaults, base_dir)
    return d


def load_xml_dict(path, **overrides):
    """Parse a Mitsuba XML file into a scene dict."""
    tree = ET.parse(path)
    root = tree.getroot()
    assert root.tag == "scene", "expected <scene> root"
    base_dir = os.path.dirname(os.path.abspath(path))
    defaults = {str(k): v for k, v in overrides.items()}
    for child in root.findall("default"):
        defaults.setdefault(child.get("name"), child.get("value"))

    d = {"type": "scene"}
    anon = 0
    for child in root:
        if child.tag == "default":
            continue
        key = child.get("id") or child.get("name") or child.tag
        if key in d:
            key = f"{key}_{anon}"
            anon += 1
        if child.tag in _PLUGIN_TAGS:
            d[key] = _node_to_dict(child, defaults, base_dir)
    return d


def dict_to_xml(d, path):
    """Write a scene dict as Mitsuba XML (reference: xml.py dict->XML writer)."""
    def emit(key, val, parent):
        if isinstance(val, dict) and "type" in val:
            t = val["type"]
            if t == "rgb":
                ET.SubElement(parent, "rgb", name=key, value=",".join(str(x) for x in (val["value"] if isinstance(val["value"], (list, tuple)) else [val["value"]])))
                return
            if t == "ref":
                ET.SubElement(parent, "ref", id=val["id"], name=key)
                return
            tag_map = {"scene": "scene"}
            tag = _tag_for_type(t)
            node = ET.SubElement(parent, tag, type=t)
            if parent.tag == "scene":
                node.set("id", key)
            else:
                node.set("name", key)
            for k, v in val.items():
                if k == "type":
                    continue
                emit(k, v, node)
        elif isinstance(val, list) and val and isinstance(val[0], dict) and "type" in val[0]:
            tnode = ET.SubElement(parent, "transform", name=key)
            for op in val:
                ot = op["type"]
                if ot == "translate":
                    ET.SubElement(tnode, "translate", value=",".join(map(str, op["value"])))
                elif ot == "scale":
                    v = op["value"]
                    ET.SubElement(tnode, "scale", value=",".join(map(str, v if isinstance(v, (list, tuple)) else [v])))
                elif ot == "rotate":
                    ET.SubElement(tnode, "rotate", value=",".join(map(str, op["axis"])), angle=str(op["angle"]))
                elif ot == "look_at":
                    ET.SubElement(tnode, "lookat",
                                  origin=",".join(map(str, op["origin"])),
                                  target=",".join(map(str, op["target"])),
                                  up=",".join(map(str, op["up"])))
        elif isinstance(val, bool):
            ET.SubElement(parent, "boolean", name=key, value=str(val).lower())
        elif isinstance(val, int):
            ET.SubElement(parent, "integer", name=key, value=str(val))
        elif isinstance(val, float):
            ET.SubElement(parent, "float", name=key, value=str(val))
        elif isinstance(val, str):
            ET.SubElement(parent, "string", name=key, value=val)
        elif isinstance(val, (list, tuple)):
            ET.SubElement(parent, "rgb", name=key, value=",".join(map(str, val)))

    root = ET.Element("scene", version="3.0.0")
    for k, v in d.items():
        if k == "type":
            continue
        emit(k, v, root)
    ET.indent(root)
    ET.ElementTree(root).write(path)


def _tag_for_type(t):
    from .render.scene_loader import (
        BSDF_TYPES, EMITTER_TYPES, INTEGRATOR_TYPES, MEDIUM_TYPES,
        PHASE_TYPES, SENSOR_TYPES, SHAPE_TYPES,
    )

    if t in BSDF_TYPES:
        return "bsdf"
    if t in SHAPE_TYPES:
        return "shape"
    if t in EMITTER_TYPES or t == "area":
        return "emitter"
    if t in SENSOR_TYPES:
        return "sensor"
    if t in INTEGRATOR_TYPES:
        return "integrator"
    if t in MEDIUM_TYPES:
        return "medium"
    if t in PHASE_TYPES:
        return "phase"
    if t == "hdrfilm" or t == "specfilm":
        return "film"
    if t == "independent" or t in ("stratified", "multijitter", "orthogonal", "ldsampler"):
        return "sampler"
    if t in ("box", "tent", "gaussian", "mitchell", "catmullrom", "lanczos"):
        return "rfilter"
    return "texture"
