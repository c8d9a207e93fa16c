"""Sanitizer-tier tests (SURVEY.md §5.2)."""

import numpy as np
import pytest

from gpufluidsimulator_tpu import scenes
from gpufluidsimulator_tpu.utils import debug


def test_checked_step_passes_clean():
    params, state = scenes.dam_break(n=400, dim=2)
    step = debug.checked_step(params, method="pallas")
    err, out = step(state)
    err.throw()
    assert np.isfinite(np.asarray(out.pos)).all()


def test_checked_step_catches_overflow():
    params, state = scenes.dam_break(n=400, dim=2)
    params = params.replace(cell_capacity=1)      # force drops
    step = debug.checked_step(params, method="pallas")
    err, _ = step(state)
    with pytest.raises(Exception, match="overflow"):
        err.throw()


def test_checked_step_catches_nan():
    params, state = scenes.dam_break(n=300, dim=2)
    params = params.replace(dt=1e6)               # absurd dt -> blowup
    step = debug.checked_step(params, method="naive")
    err, out = step(state)
    err2, out = step(out)
    try:
        err.throw()
        err2.throw()
        # if it somehow stayed finite, that's fine too — no assertion
    except Exception as e:
        assert "non-finite" in str(e)


def test_determinism_harness():
    params, state = scenes.dam_break(n=300, dim=2, jitter=0.2, seed=2)
    debug.assert_deterministic(params, state, n_steps=5, method="pallas")
    debug.assert_deterministic(params, state, n_steps=5, method="naive")
