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
    ap.add_argument("-a", "--append-path", action="append", default=[],
                    help="add an entry to the resource search path "
                         "(reference: mitsuba.cpp -a / FileResolver)")
    ap.add_argument("--spp", type=int, default=None, help="samples per pixel")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--spp-per-pass", type=int, default=None,
                    help="progressive rendering: accumulate in passes of this "
                         "many spp, refreshing the output after each pass")
    ap.add_argument("--timeout", type=float, default=None,
                    help="stop after this many seconds (at a pass boundary) "
                         "and write the partial image (reference: "
                         "integrator.cpp:24 render timeout)")
    args = ap.parse_args(argv)

    import mitsuba_tpu as mi

    for p in args.append_path:
        mi.file_resolver().append(p)

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

    out = args.output or "output.exr"
    import signal

    import numpy as np

    from .utils.io import write_bitmap

    t0 = time.time()
    if args.spp_per_pass or args.timeout:
        # progressive multi-pass accumulation with partial-image writes:
        # SIGHUP dumps the current estimate (reference: mitsuba.cpp:142-150),
        # --timeout stops at a pass boundary (reference: integrator.cpp:24)
        from .render_api import render_progressive

        partial = {"img": None, "spp": 0}

        def _write_partial(signum=None, frame=None):
            if partial["img"] is not None:
                _write(out, np.asarray(partial["img"]), write_bitmap)
                print(f"[mitsuba_tpu] wrote partial image ({partial['spp']} spp)"
                      f" to {out}", file=sys.stderr)

        old_hup = None
        if hasattr(signal, "SIGHUP"):
            old_hup = signal.signal(signal.SIGHUP, _write_partial)
        try:
            for spp_done, img in render_progressive(
                scene, sensor=args.sensor, seed=args.seed, spp=args.spp,
                spp_per_pass=args.spp_per_pass,
            ):
                img.block_until_ready()
                partial["img"], partial["spp"] = img, spp_done
                print(f"[mitsuba_tpu] pass done: {spp_done} spp "
                      f"({time.time() - t0:.2f}s)", file=sys.stderr)
                if args.timeout and time.time() - t0 > args.timeout:
                    print(f"[mitsuba_tpu] timeout after {args.timeout}s — "
                          f"stopping at {spp_done} spp", file=sys.stderr)
                    break
        except KeyboardInterrupt:
            print("[mitsuba_tpu] interrupted — writing partial image",
                  file=sys.stderr)
        finally:
            if old_hup is not None:
                signal.signal(signal.SIGHUP, old_hup)
        img = partial["img"]
        if img is None:
            sys.exit(1)
    else:
        img = mi.render(scene, sensor=args.sensor, seed=args.seed, spp=args.spp)
        img.block_until_ready()
    print(f"[mitsuba_tpu] rendered in {time.time() - t0:.2f}s", file=sys.stderr)

    arr = np.asarray(img)
    _write(out, arr, write_bitmap)
    print(f"[mitsuba_tpu] wrote {out}", file=sys.stderr)


def _write(out, arr, write_bitmap):
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


if __name__ == "__main__":
    main()
