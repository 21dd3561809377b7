"""Exact mid-run resume (checkpoint + ``solve(resume_from=...)``).

This capability goes beyond the reference, whose only warm restart
(``seed_solution``, ``tdgl/solver/solver.py:113,732-752``) re-seeds the
fields but loses the integrator state (adaptive dt, dt window, step/time).
The checkpoint carries the COMPLETE device state pytree, so a resumed run
must reproduce an uninterrupted run step for step.
"""

import os

import h5py
import numpy as np
import pytest

import tdgl_tpu as tdgl
from tdgl_tpu.geometry import box


def _device(structured: bool, min_points=900):
    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2.0,
                       thickness=0.1, conductivity=10.0)
    film = tdgl.Polygon("film", points=box(15)).resample(200)
    device = tdgl.Device("resume", layer=layer, film=film,
                         length_units="um")
    device.make_mesh(min_points=min_points, structured=structured)
    return device


def _options(solve_time, path, **kwargs):
    return tdgl.SolverOptions(
        solve_time=solve_time,
        dt_init=1e-4,
        dt_max=1e-2,
        save_every=100,
        field_units="mT",
        current_units="uA",
        output_file=path,
        dtype="float64",   # exact comparison across runs
        **kwargs,
    )


@pytest.mark.parametrize("structured", [True, False],
                         ids=["grid", "ell"])
def test_resume_reproduces_uninterrupted_run(tmp_path, structured):
    device = _device(structured)
    A = 0.4  # strong enough for vortex dynamics (adaptive dt active)

    # Uninterrupted run to t = 8.
    full = tdgl.solve(
        device, _options(8.0, str(tmp_path / "full.h5")),
        applied_vector_potential=A,
    )

    # Interrupted at t = 4, then resumed to t = 8.
    part = tdgl.solve(
        device, _options(4.0, str(tmp_path / "part.h5")),
        applied_vector_potential=A,
    )
    with h5py.File(part.path, "r") as f:
        assert "checkpoint" in f
        ckpt_step = int(f["checkpoint"].attrs["step"])
        assert ckpt_step > 0
    resumed = tdgl.solve(
        device, _options(8.0, str(tmp_path / "resumed.h5")),
        applied_vector_potential=A,
        resume_from=part.path,
    )

    # The resumed trajectory must continue EXACTLY: identical final state.
    psi_full = full.tdgl_data.psi
    psi_res = resumed.tdgl_data.psi
    np.testing.assert_array_equal(psi_res, psi_full)
    np.testing.assert_array_equal(resumed.tdgl_data.mu, full.tdgl_data.mu)
    assert resumed.tdgl_data.state["step"] == full.tdgl_data.state["step"]
    assert resumed.tdgl_data.state["time"] == full.tdgl_data.state["time"]
    assert resumed.tdgl_data.state["dt"] == full.tdgl_data.state["dt"]
    # Snapshot attrs carry ABSOLUTE time, continuing from the checkpoint
    # (the dynamics dt-cumsum axis restarts at 0, matching the reference's
    # own per-stage convention).
    with h5py.File(resumed.path, "r") as f:
        assert f["data/0"].attrs["time"] == pytest.approx(4.0, abs=0.2)
        assert f["data/0"].attrs["step"] == ckpt_step


def test_resume_requires_checkpoint(tmp_path):
    device = _device(structured=True)
    sol = tdgl.solve(
        device,
        _options(1.0, str(tmp_path / "nock.h5"), save_checkpoints=False),
        applied_vector_potential=0.2,
    )
    with h5py.File(sol.path, "r") as f:
        assert "checkpoint" not in f
    with pytest.raises(ValueError, match="no checkpoint"):
        tdgl.solve(
            device, _options(2.0, str(tmp_path / "res.h5")),
            applied_vector_potential=0.2,
            resume_from=sol.path,
        )


def test_resume_rejects_mismatched_mesh(tmp_path):
    device = _device(structured=True)
    sol = tdgl.solve(
        device, _options(1.0, str(tmp_path / "a.h5")),
        applied_vector_potential=0.2,
    )
    other = _device(structured=True, min_points=2000)
    with pytest.raises(ValueError, match="shape|fingerprint"):
        tdgl.solve(
            other, _options(2.0, str(tmp_path / "b.h5")),
            applied_vector_potential=0.2,
            resume_from=sol.path,
        )
    # Backend mismatch is caught before shapes.
    ell = _device(structured=False)
    with pytest.raises(ValueError, match="backend"):
        tdgl.solve(
            ell, _options(2.0, str(tmp_path / "c.h5")),
            applied_vector_potential=0.2,
            resume_from=sol.path,
        )


def test_resume_rejects_finished_run(tmp_path):
    device = _device(structured=True)
    sol = tdgl.solve(
        device, _options(1.0, str(tmp_path / "d.h5")),
        applied_vector_potential=0.2,
    )
    with pytest.raises(ValueError, match="solve_time"):
        tdgl.solve(
            device, _options(1.0, str(tmp_path / "e.h5")),
            applied_vector_potential=0.2,
            resume_from=sol.path,
        )


def test_resume_after_hard_kill(tmp_path):
    """SIGKILL the solver mid-run (simulated preemption) and resume from
    the partial file: the per-checkpoint flush must leave a readable
    checkpoint even though the writer never closed the file."""
    import signal
    import subprocess
    import sys
    import textwrap
    import time

    out = tmp_path / "killed.h5"
    script = textwrap.dedent(f"""
        import jax; jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import tdgl_tpu as tdgl
        from tdgl_tpu.geometry import box
        layer = tdgl.Layer(coherence_length=1.0, london_lambda=2.0,
                           thickness=0.1, conductivity=10.0)
        film = tdgl.Polygon("film", points=box(15)).resample(200)
        device = tdgl.Device("kill", layer=layer, film=film,
                             length_units="um")
        device.make_mesh(min_points=900, structured=True)
        options = tdgl.SolverOptions(
            solve_time=1e5, dt_init=1e-4, dt_max=1e-2, save_every=50,
            field_units="mT", current_units="uA", dtype="float64",
            output_file={str(out)!r},
        )
        tdgl.solve(device, options, applied_vector_potential=0.4)
    """)
    repo_root = os.path.dirname(os.path.dirname(tdgl.__file__))
    env = dict(os.environ, PYTHONPATH=repo_root, MPLBACKEND="Agg")
    proc = subprocess.Popen([sys.executable, "-c", script],
                            cwd=str(tmp_path), env=env)
    # Wait for at least two flushed checkpoints, then kill hard. The
    # writer holds the HDF5 lock, so peek with locking disabled (torn
    # reads are retried).
    deadline = time.time() + 240
    seen_step = 0
    while time.time() < deadline:
        if out.exists():
            try:
                with h5py.File(out, "r", locking=False) as f:
                    if "checkpoint" in f:
                        seen_step = int(f["checkpoint"].attrs["step"])
            except (OSError, KeyError):
                pass  # writer mid-flush; retry
        if seen_step >= 100:
            break
        time.sleep(0.5)
    assert proc.poll() is None, "solver exited before it could be killed"
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=60)
    assert seen_step >= 100, "never saw a checkpoint before the deadline"

    with h5py.File(out, "r") as f:
        ckpt_step = int(f["checkpoint"].attrs["step"])
        ckpt_time = float(f["checkpoint"].attrs["time"])
    device = _device(structured=True)
    resumed = tdgl.solve(
        device,
        _options(ckpt_time + 1.0, str(tmp_path / "continued.h5")),
        applied_vector_potential=0.4,
        resume_from=str(out),
    )
    assert int(resumed.tdgl_data.state["step"]) > ckpt_step
    assert float(resumed.tdgl_data.state["time"]) >= ckpt_time + 1.0


def test_resume_screened_and_traced_A(tmp_path):
    """Resume with self-consistent screening (A_induced rides in the
    state) and a TRACED time-dependent applied potential: the continued
    trajectory matches an uninterrupted run exactly."""
    import tdgl_tpu.sources as sources

    device = _device(structured=True, min_points=500)
    A = sources.LinearRamp(tmin=0, tmax=2.0) * sources.ConstantField(
        0.3, field_units="mT"
    )

    def run(solve_time, path, resume_from=None):
        options = tdgl.SolverOptions(
            solve_time=solve_time, dt_init=1e-4, dt_max=1e-2,
            save_every=100, field_units="mT", current_units="uA",
            output_file=path, dtype="float64",
            include_screening=True, screening_tolerance=1e-3,
        )
        return tdgl.solve(device, options, applied_vector_potential=A,
                          resume_from=resume_from)

    full = run(4.0, str(tmp_path / "sfull.h5"))
    part = run(2.0, str(tmp_path / "spart.h5"))
    resumed = run(4.0, str(tmp_path / "sres.h5"), resume_from=part.path)
    np.testing.assert_array_equal(resumed.tdgl_data.psi, full.tdgl_data.psi)
    np.testing.assert_array_equal(
        resumed.tdgl_data.induced_vector_potential,
        full.tdgl_data.induced_vector_potential,
    )
    assert resumed.tdgl_data.state["time"] == full.tdgl_data.state["time"]


def test_resume_factored_repairs_masked_A(tmp_path):
    """The factored-link-phase path needs the SMOOTH full-grid A fill in
    state.A_applied. Resuming a checkpoint whose fill is the masked
    (edge-scattered) grid — same physics at real edges — must repair it
    in place; a checkpoint from a genuinely different applied potential
    must be rejected."""
    device = _device(structured=True)

    def options(solve_time, path):
        return tdgl.SolverOptions(
            solve_time=solve_time, dt_init=1e-4, dt_max=1e-2,
            save_every=100, field_units="mT", current_units="uA",
            output_file=path, dtype="float32",
        )

    sol = tdgl.solve(device, options(2.0, str(tmp_path / "f.h5")),
                     applied_vector_potential=0.3)

    from tdgl_tpu.solver.solver import TDGLSolver

    probe = TDGLSolver(device, options(4.0, str(tmp_path / "p.h5")),
                       applied_vector_potential=0.3)
    assert probe.cfg.factor_link_phases  # uniform field, f32 structured
    maps = probe.maps

    # Overwrite the checkpoint's A_applied with the masked fill an older
    # writer would have produced (smooth values at real edges only).
    with h5py.File(sol.path, "r+") as f:
        A = np.asarray(f["checkpoint"]["A_applied"])
        flat = np.zeros((3 * A.shape[1] * A.shape[2], 2), A.dtype)
        flat[maps.edge_flat] = A.reshape(-1, 2)[maps.edge_flat]
        del f["checkpoint"]["A_applied"]
        f["checkpoint"]["A_applied"] = flat.reshape(A.shape)

    resumed = tdgl.solve(
        device, options(3.0, str(tmp_path / "r.h5")),
        applied_vector_potential=0.3, resume_from=sol.path,
    )
    assert resumed.tdgl_data is not None  # repaired and ran

    # A genuinely different field in the checkpoint is rejected.
    with h5py.File(sol.path, "r+") as f:
        A = np.asarray(f["checkpoint"]["A_applied"])
        del f["checkpoint"]["A_applied"]
        f["checkpoint"]["A_applied"] = 2.0 * A
    with pytest.raises(ValueError, match="A_applied"):
        tdgl.solve(
            device, options(3.0, str(tmp_path / "r2.h5")),
            applied_vector_potential=0.3, resume_from=sol.path,
        )
