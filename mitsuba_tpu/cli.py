"""Command-line renderer (reference: src/mitsuba/mitsuba.cpp:38-365:
`mitsuba -m <variant> -o out.exr -D key=value -s sensor scene.xml`).

Usage:  python -m mitsuba_tpu <scene.xml|scene.json> [-m variant] [-o out.exr]
                              [-D key=value ...] [-s sensor] [--spp N]
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="mitsuba_tpu",
        description="TPU-native differentiable renderer (Mitsuba 3 scene format)",
    )
    ap.add_argument("scene", help="scene file (.xml or .json dict)")
    ap.add_argument("-m", "--mode", default="llvm_ad_rgb", help="variant name")
    ap.add_argument("-o", "--output", default=None, help="output image (exr/png/pfm/npy)")
    ap.add_argument("-D", "--define", action="append", default=[],
                    help="parameter override key=value (scene-dict $defaults)")
    ap.add_argument("-s", "--sensor", type=int, default=0, help="sensor index")
    ap.add_argument("--spp", type=int, default=None, help="samples per pixel")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import mitsuba_tpu as mi

    mi.set_variant(args.mode)

    defines = {}
    for d in args.define:
        k, _, v = d.partition("=")
        try:
            defines[k] = json.loads(v)
        except json.JSONDecodeError:
            defines[k] = v

    t0 = time.time()
    if args.scene.endswith(".xml"):
        scene = mi.load_file(args.scene, **defines)
    else:
        with open(args.scene) as f:
            d = json.load(f)
        scene = mi.load_dict(d)
    print(f"[mitsuba_tpu] scene loaded in {time.time() - t0:.2f}s "
          f"({scene.geometry.n_tris} tris, variant {mi.variant()})", file=sys.stderr)

    t0 = time.time()
    img = mi.render(scene, sensor=args.sensor, seed=args.seed, spp=args.spp)
    img.block_until_ready()
    print(f"[mitsuba_tpu] rendered in {time.time() - t0:.2f}s", file=sys.stderr)

    out = args.output or "output.exr"
    import numpy as np

    from .utils.io import write_bitmap

    arr = np.asarray(img)
    if arr.ndim == 4:   # polarized [H, W, 4, C]: flatten to I/Q/U/V[.k] channels
        h, w, s, c = arr.shape
        names = []
        for k in range(c):
            for comp in "IQUV":
                names.append(comp if c == 1 else f"{comp}.{k:02d}")
        arr = arr.transpose(0, 1, 3, 2).reshape(h, w, s * c)
        write_bitmap(out, arr, channel_names=names)
    else:
        write_bitmap(out, arr)
    print(f"[mitsuba_tpu] wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
