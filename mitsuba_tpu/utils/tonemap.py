"""HDR tonemapping (reference: src/python/python/tonemap.py)."""
from __future__ import annotations

import numpy as np


def gamma(img, g=2.2, exposure=0.0):
    return np.clip(np.asarray(img) * (2.0 ** exposure), 0.0, 1.0) ** (1.0 / g)


def reinhard(img, exposure=0.0, burn=0.0):
    """Reinhard et al. 2002 global operator with optional burn-out."""
    x = np.asarray(img) * (2.0 ** exposure)
    if burn > 0:
        white = np.percentile(x, 100 - burn) + 1e-9
        x = x * (1 + x / white**2) / (1 + x)
    else:
        x = x / (1 + x)
    return np.clip(x, 0.0, 1.0) ** (1 / 2.2)


def aces(img, exposure=0.0):
    """ACES filmic fit (Narkowicz 2015)."""
    x = np.asarray(img) * (2.0 ** exposure)
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return np.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0) ** (1 / 2.2)
