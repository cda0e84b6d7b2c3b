"""Multi-host entry point, isolated in a dependency-free module.

jax.distributed.initialize() must run before ANYTHING touches the XLA
backend — and importing mitsuba_tpu eagerly builds jnp tables (CIE data,
warp constants), which does.  Keeping this module free of package imports
lets a launcher script initialize the pod first:

    from mitsuba_tpu.parallel.distributed import init_distributed   # or
    # load by path before the package import in constrained launchers:
    #   importlib.util.spec_from_file_location(...)
    init_distributed(...)
    import mitsuba_tpu as mi                                        # now safe

(The reference is single-process; this is the TPU-pod analog —
SURVEY.md §5 'Distributed communication backend'.)
"""
from __future__ import annotations

import jax


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Call once per host before building a mesh; afterwards jax.devices()
    spans every host's chips and make_mesh() shards the wavefront across the
    full pod — collectives ride ICI within a slice and DCN across slices.

    Args mirror jax.distributed.initialize; under a TPU pod runtime all can
    be None (auto-discovered from the environment)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return jax.devices()
