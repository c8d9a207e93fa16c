"""CLI tests (SURVEY.md §2 "App/CLI"): run/bench/render subcommands through
the real argv surface, including checkpoint + resume + frame export."""

import json
import os

import numpy as np
import pytest

from gpufluidsimulator_tpu.utils.cli import main


def test_run_small(tmp_path, capsys):
    mj = str(tmp_path / "m.json")
    rc = main(["run", "-n", "300", "--dim", "2", "--steps", "40",
               "--report-every", "20", "--method", "naive",
               "--metrics-json", mj])
    assert rc == 0
    out = capsys.readouterr().out
    assert "steps/s" in out
    m = json.load(open(mj))
    assert m["steps"] == 40
    assert m["n_particles"] >= 200


def test_run_frames_and_checkpoints(tmp_path):
    frames = str(tmp_path / "frames")
    ckpts = str(tmp_path / "ckpts")
    rc = main(["run", "-n", "200", "--dim", "2", "--steps", "20",
               "--report-every", "10", "--method", "naive",
               "--frames-dir", frames, "--width", "64", "--height", "64",
               "--checkpoint-dir", ckpts])
    assert rc == 0
    assert len(os.listdir(frames)) == 2
    assert any(f.endswith(".npz") for f in os.listdir(ckpts))


def test_run_movie_export(tmp_path, capsys):
    """--movie records in-scan frames to one .npz (frames, N, dim)."""
    mv = str(tmp_path / "movie.npz")
    rc = main(["run", "-n", "300", "--dim", "2", "--steps", "30",
               "--method", "naive", "--movie", mv, "--movie-every", "10"])
    assert rc == 0
    assert "3 frames" in capsys.readouterr().out
    with np.load(mv) as z:
        assert z["frames"].shape[0] == 3
        assert z["frames"].shape[2] == 2
        assert int(z["every"]) == 10
        assert np.isfinite(z["frames"]).all()


def test_run_resume(tmp_path, capsys):
    ckpts = str(tmp_path / "ckpts")
    main(["run", "-n", "200", "--dim", "2", "--steps", "10",
          "--report-every", "10", "--method", "naive",
          "--checkpoint-dir", ckpts])
    from gpufluidsimulator_tpu.utils import checkpoint
    latest = checkpoint.latest(ckpts)
    rc = main(["run", "--steps", "10", "--report-every", "10",
               "--method", "naive", "--resume", latest])
    assert rc == 0
    assert "resumed" in capsys.readouterr().out


def test_bench_json(capsys):
    rc = main(["bench", "-n", "300", "--dim", "2", "--method", "naive",
               "--k1", "1", "--k2", "3"])
    assert rc == 0
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    d = json.loads(line)
    assert d["value"] > 0 and d["ms_per_frame"] > 0
    assert d["metric"] == "particle-steps/sec/chip"


def test_render_from_checkpoint(tmp_path, capsys):
    ckpts = str(tmp_path / "ckpts")
    main(["run", "-n", "200", "--dim", "2", "--steps", "10",
          "--report-every", "10", "--method", "naive",
          "--checkpoint-dir", ckpts])
    from gpufluidsimulator_tpu.utils import checkpoint
    out = str(tmp_path / "f.png")
    rc = main(["render", checkpoint.latest(ckpts), "-o", out,
               "--width", "64", "--height", "64"])
    assert rc == 0
    assert open(out, "rb").read(8) == b"\x89PNG\r\n\x1a\n"


def test_param_overrides(capsys):
    rc = main(["bench", "-n", "200", "--dim", "2", "--method", "naive",
               "--viscosity", "1.5", "--k1", "1", "--k2", "2"])
    assert rc == 0


def test_run_native_method(capsys):
    """The reference's CPU-mode switch: --method native steps through the
    C++ engine via the same CLI surface (SURVEY.md §3.4)."""
    from gpufluidsimulator_tpu.oracle import native as _native
    if not _native.available():
        pytest.skip("native fluidcore not built")
    rc = main(["run", "-n", "200", "--dim", "2", "--steps", "20",
               "--report-every", "10", "--method", "native"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "method=native" in out


def test_bench_native_method(capsys):
    from gpufluidsimulator_tpu.oracle import native as _native
    if not _native.available():
        pytest.skip("native fluidcore not built")
    rc = main(["bench", "-n", "300", "--dim", "2", "--method", "native",
               "--k1", "1", "--k2", "3"])
    assert rc == 0
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    d = json.loads(line)
    assert d["method"] == "native" and d["value"] > 0


def test_fluidsim_native_matches_oracle():
    """FluidSim(method='native') must advance exactly like oracle.native.run."""
    import numpy as np
    from gpufluidsimulator_tpu import FluidSim, scenes
    from gpufluidsimulator_tpu.oracle import native as _native
    if not _native.available():
        pytest.skip("native fluidcore not built")
    params, state = scenes.dam_break(n=300, dim=2, jitter=0.2, seed=7)
    sim = FluidSim(params, state, method="native")
    sim.step(15)
    p_ref, v_ref, _, _ = _native.run(
        np.asarray(state.pos, np.float64), np.asarray(state.vel, np.float64),
        params, 15)
    np.testing.assert_allclose(np.asarray(sim.state.pos), p_ref.astype(np.float32),
                               rtol=0, atol=1e-6)
    # positions come back in spawn order (ids untouched by the native path)
    np.testing.assert_allclose(sim.get_positions(),
                               p_ref.astype(np.float32), rtol=0, atol=1e-6)
