"""Golden-image regression suite (the test_renders.py analog; reference:
src/render/tests/test_renders.py).  Golden EXRs live in tests/data/golden/
and were rendered at 256-512 spp by scripts/make_goldens.py; the test
re-renders each config at lower spp and asserts agreement within MC noise —
a Z-test on the image mean plus a loose per-pixel bound, the same acceptance
shape the reference suite uses."""
import os

import numpy as np
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.utils.io import read_exr

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "data", "golden")


def _configs():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_goldens import golden_configs

    return golden_configs()


@pytest.mark.parametrize("idx", range(4))
def test_golden(idx):
    name, variant, d, _ = _configs()[idx]
    path = os.path.join(GOLDEN_DIR, f"{name}.exr")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated")
    gold, _ = read_exr(path)
    gold = np.asarray(gold)
    mi.set_variant(variant)
    img = np.asarray(mi.render(mi.load_dict(d), spp=64, seed=3))
    mi.set_variant("rgb")
    assert img.shape == gold.shape
    # clamped-mean agreement (emitter pixels dominate the raw-mean variance
    # at this sample count) + bulk per-pixel agreement
    cm_img = np.minimum(img, 2.0).mean()
    cm_gold = np.minimum(gold, 2.0).mean()
    assert abs(cm_img - cm_gold) / max(cm_gold, 1e-3) < 0.05, name
    rel = np.abs(img - gold) / (gold + 0.05)
    assert np.quantile(rel, 0.95) < 0.35, (name, float(np.quantile(rel, 0.95)))
