"""Observability + checkpoint subsystems (SURVEY §5 aux rows)."""
import logging

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.utils.observe import warn_invalid, report_invalid, phase, Progress
from mitsuba_tpu.utils.checkpoint import save_checkpoint, load_checkpoint


def test_warn_invalid_sanitizes():
    L = jnp.asarray([[1.0, 2.0, 3.0], [np.nan, 1.0, 0.0],
                     [-0.5, 0.2, 0.1], [np.inf, 0.0, 0.0]])
    clean, stats = warn_invalid(L)
    c = np.asarray(clean)
    assert np.isfinite(c).all() and (c >= 0).all()
    assert int(stats["n_invalid"]) == 2
    assert int(stats["n_negative"]) == 1
    np.testing.assert_allclose(c[0], [1, 2, 3])


def test_warn_invalid_respects_active():
    L = jnp.asarray([[np.nan], [1.0]])
    active = jnp.asarray([False, True])
    clean, stats = warn_invalid(L, active)
    assert int(stats["n_invalid"]) == 0


def test_report_invalid_logs(caplog):
    L = jnp.asarray([[np.nan], [1.0]])
    _, stats = warn_invalid(L)
    with caplog.at_level(logging.WARNING, logger="mitsuba_tpu"):
        ni, nn = report_invalid({k: int(v) for k, v in stats.items()})
    assert ni == 1 and "NaN" in caplog.text


def test_phase_scope_and_progress(caplog):
    with phase("intersect"):
        x = jnp.ones((8,)) * 2
    import io
    buf = io.StringIO()
    p = Progress("test", stream=buf)
    p.update(1, 4)
    assert "1/4" in buf.getvalue()


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"albedo": np.random.rand(3).astype(np.float32),
                   "sigma": jnp.asarray([[1.0, 2.0]])},
        "opt": (jnp.zeros((4,)), {"step": np.int64(7)}),
        "film": np.random.rand(8, 8, 3).astype(np.float32),
        "seed": np.uint32(42),
        "nothing": None,
    }
    fn = str(tmp_path / "ckpt.npz")
    save_checkpoint(fn, state)
    back = load_checkpoint(fn)
    assert back["nothing"] is None
    np.testing.assert_array_equal(back["params"]["albedo"], state["params"]["albedo"])
    np.testing.assert_array_equal(back["params"]["sigma"], np.asarray(state["params"]["sigma"]))
    np.testing.assert_array_equal(back["film"], state["film"])
    assert back["seed"] == 42 and back["opt"][1]["step"] == 7
    assert isinstance(back["opt"], tuple)
