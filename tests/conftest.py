"""Test configuration: run the suite on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "backend_optimization_level" not in flags:
    # LLVM O3 codegen goes pathological (hours) on some fused render graphs
    # (e.g. the ptracer camera-connection block); O1 compiles them in seconds
    # and is plenty for correctness tests.  TPU compiles are unaffected.
    flags = (flags + " --xla_backend_optimization_level=1").strip()
os.environ["XLA_FLAGS"] = flags

# The axon sitecustomize hook imports jax at interpreter startup with
# JAX_PLATFORMS=axon already in the environment, so the os.environ writes
# above are too late for jax's own config snapshot.  Backends initialize
# lazily, so forcing the config value here (before any test touches a
# device) still pins the whole suite to the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def variant_rgb():
    import mitsuba_tpu as mi

    mi.set_variant("rgb")
    yield
    mi.set_variant("rgb")


@pytest.fixture
def variant_mono():
    import mitsuba_tpu as mi

    mi.set_variant("mono")
    yield
    mi.set_variant("rgb")


@pytest.fixture
def variant_mono_polarized():
    import mitsuba_tpu as mi

    mi.set_variant("llvm_ad_mono_polarized")
    yield
    mi.set_variant("rgb")


@pytest.fixture
def variant_spectral():
    import mitsuba_tpu as mi

    mi.set_variant("spectral")
    yield
    mi.set_variant("rgb")
