"""mitsuba_tpu — a TPU-native differentiable Monte Carlo renderer.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the
ksalesin/mitsuba3-nasa fork of Mitsuba 3 (polarized spectral forward +
inverse radiative transfer).  See SURVEY.md at the repo root for the
capability blueprint and reference anchors.

Typical use mirrors the reference Python API:

    import mitsuba_tpu as mi
    mi.set_variant('llvm_ad_rgb')        # -> rgb variant
    scene = mi.load_dict(mi.cornell_box())
    img = mi.render(scene, spp=64)
"""
from .variant import set_variant, variant, variants, current_variant, Variant

from .core import math, warp, quad, spectrum
from .core.transform import Transform, build_transform
from .core.rng import RNG
from .core.distr import (
    DiscreteDistribution,
    ContinuousDistribution,
    IrregularContinuousDistribution,
)

__version__ = "0.1.0"

# Populated as subsystems land (scene loading, render entry points, AD ops):
from .render.scene_loader import load_dict, load_file, cornell_box  # noqa: E402
from .render.params import traverse, SceneParameters  # noqa: E402
from .render_api import (  # noqa: E402
    render, render_1, render_test, render_forward, scene_tangent, CancelToken,
)
from . import ad  # noqa: E402
from .utils import io as util  # noqa: E402  (mi.util.write_bitmap parity)
from .utils import polvis, tonemap  # noqa: E402
from . import chi2  # noqa: E402
from .xml import dict_to_xml, load_xml_dict  # noqa: E402
from .utils.denoise import Denoiser, denoise  # noqa: E402
OptixDenoiser = Denoiser  # reference-name alias (optixdenoiser.h wrapper)
from .utils.io import Bitmap  # noqa: E402
from .utils.observe import Log, LogLevel, set_log_level  # noqa: E402
from .core.fresolver import FileResolver, file_resolver  # noqa: E402
from .plugin_registry import (  # noqa: E402
    register_plugin, unregister_plugin,
    register_bsdf, register_texture, register_emitter, register_sensor,
    register_shape, register_phase, register_phasefunction, register_medium,
    register_volume, register_integrator, register_sampler, register_film,
    register_rfilter,
)
