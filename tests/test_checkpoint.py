"""Checkpoint/resume tests (SURVEY.md §5.4): round-trip fidelity, resumed
trajectory bit-matches an uninterrupted run, rotation keeps newest N."""

import numpy as np

from gpufluidsimulator_tpu import scenes, run
from gpufluidsimulator_tpu.utils import checkpoint


def test_roundtrip(tmp_path):
    params, state = scenes.double_dam_break(n=800, dim=2)
    path = str(tmp_path / "c.npz")
    checkpoint.save(path, state, params, step=42)
    s2, p2, step = checkpoint.load(path)
    assert step == 42
    assert p2 == params                       # frozen dataclass equality
    for a, b in zip(state, s2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_resume_bitwise_trajectory(tmp_path):
    params, state = scenes.dam_break(n=400, dim=2, jitter=0.2, seed=3)
    full = run(state, params, 60, method="naive")

    half = run(state, params, 30, method="naive")
    path = str(tmp_path / "mid.npz")
    checkpoint.save(path, half, params, step=30)
    loaded, p2, step = checkpoint.load(path)
    resumed = run(loaded, p2, 30, method="naive")
    assert np.array_equal(np.asarray(full.pos), np.asarray(resumed.pos))
    assert np.array_equal(np.asarray(full.vel), np.asarray(resumed.vel))


def test_rotate_keeps_newest(tmp_path):
    params, state = scenes.dam_break(n=100, dim=2)
    d = str(tmp_path / "ckpts")
    for step in range(5):
        checkpoint.rotate(d, state, params, step, keep=3)
    import os
    names = sorted(os.listdir(d))
    assert len(names) == 3
    assert names[-1] == "ckpt_000000004.npz"
    assert checkpoint.latest(d).endswith("ckpt_000000004.npz")


def test_latest_empty(tmp_path):
    assert checkpoint.latest(str(tmp_path / "nope")) is None


def test_planes_checkpoint_roundtrip(tmp_path):
    """IncState snapshots round-trip bitwise (no planes->flat conversion);
    determinism then guarantees identical continued trajectories."""
    from gpufluidsimulator_tpu.ops import inc
    from gpufluidsimulator_tpu.ops import planes as pm

    params, state = scenes.dam_break(n=500, dim=2, jitter=0.2, seed=1)
    params = params.replace(diagnostics=False)
    geom = pm.geometry(params)
    s = inc.to_planes(state.pos, state.vel, state.ids, params, geom)
    path = str(tmp_path / "planes.npz")
    checkpoint.save_planes(path, s, params, step=7, n=state.n)
    s2, p2, step, n = checkpoint.load_planes(path)
    assert (step, n) == (7, state.n)
    assert p2 == params
    assert np.array_equal(np.asarray(s.fields6), np.asarray(s2.fields6))
    assert np.array_equal(np.asarray(s.idp), np.asarray(s2.idp))
    assert int(s.overflow) == int(s2.overflow)
