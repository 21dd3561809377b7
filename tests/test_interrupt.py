"""KeyboardInterrupt handling: pause/resume and graceful cancel.

The reference treats interrupt handling as first-class runner behavior
(``tdgl/solver/runner.py:434-451``): with ``pause_on_interrupt`` the user
is prompted and may resume; otherwise (or on 'no') the run is cancelled
but still returns the data generated so far — and a cancel during
thermalization returns ``None`` (``tdgl/solver/solver.py:716-721``).

The interrupt is injected by wrapping the solver's compiled ``chunk_fn``
with a callable that raises ``KeyboardInterrupt`` before a chosen chunk —
exactly where a real Ctrl-C lands (inside the runner's per-chunk try
block), on both the structured (grid) and unstructured (ELL) backends.
"""

import numpy as np
import pytest

import tdgl_tpu as tdgl
from tdgl_tpu.geometry import box
from tdgl_tpu.solver.solver import TDGLSolver


def _make_device(structured):
    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2, thickness=0.1)
    film = tdgl.Polygon("film", points=box(8)).resample(150)
    device = tdgl.Device("film", layer=layer, film=film,
                         probe_points=[(-3, 0), (3, 0)])
    device.make_mesh(min_points=500, smooth=(0 if structured else 20),
                     structured=structured)
    return device


def _interrupting_solver(device, options, interrupt_at, n_interrupts=1):
    """Build a solver whose chunk_fn raises KeyboardInterrupt before the
    ``interrupt_at``-th chunk call (1-based), ``n_interrupts`` times."""
    solver = TDGLSolver(device, options,
                        applied_vector_potential=tdgl.ConstantField(
                            100, field_units="uT"))
    orig = solver.chunk_fn
    calls = {"n": 0, "left": n_interrupts}

    def chunk_fn(state):
        calls["n"] += 1
        if calls["n"] == interrupt_at and calls["left"] > 0:
            calls["left"] -= 1
            raise KeyboardInterrupt
        return orig(state)

    solver.chunk_fn = chunk_fn
    return solver, calls


@pytest.mark.parametrize("structured", [True, False],
                         ids=["grid", "ell"])
def test_interrupt_cancel_returns_partial_data(structured, tmp_path):
    """Cancelling mid-simulation still returns a Solution holding the data
    generated so far, backed by a valid, loadable output file."""
    device = _make_device(structured)
    options = tdgl.SolverOptions(
        solve_time=50, dt_init=1e-4, save_every=50, steps_per_chunk=50,
        field_units="uT", current_units="uA",
        pause_on_interrupt=False,
        output_file=str(tmp_path / f"cancel_{structured}.h5"),
    )
    solver, calls = _interrupting_solver(device, options, interrupt_at=4)
    solution = solver.solve()
    assert solution is not None
    assert calls["n"] >= 4
    times = solution.times
    assert times is not None and len(times) >= 1
    # Partial: the run was cut well before solve_time.
    assert float(times[-1]) < 50.0
    # The output file is complete and loadable.
    reloaded = tdgl.Solution.from_hdf5(solution.path)
    assert reloaded.equals(solution)
    assert np.isfinite(np.abs(reloaded.tdgl_data.psi)).all()


@pytest.mark.parametrize("structured", [True, False],
                         ids=["grid", "ell"])
def test_interrupt_pause_resume_continues(structured, tmp_path,
                                          monkeypatch):
    """With pause_on_interrupt, answering 'y' resumes the run and it
    completes to solve_time as if never interrupted."""
    device = _make_device(structured)
    prompts = []

    def fake_input(prompt=""):
        prompts.append(prompt)
        return "y"

    monkeypatch.setattr("builtins.input", fake_input)
    options = tdgl.SolverOptions(
        solve_time=3, dt_init=1e-4, save_every=50, steps_per_chunk=50,
        field_units="uT", current_units="uA",
        pause_on_interrupt=True,
        output_file=str(tmp_path / f"pause_{structured}.h5"),
    )
    solver, calls = _interrupting_solver(device, options, interrupt_at=2)
    solution = solver.solve()
    assert solution is not None
    assert len(prompts) == 1 and "paused" in prompts[0]
    # Resumed and ran to completion.
    assert float(solution.times[-1]) >= 3.0 - 1e-6


def test_interrupt_pause_then_decline_cancels(tmp_path, monkeypatch):
    """Answering anything but 'y' at the pause prompt cancels (with
    partial data), matching the reference's prompt semantics."""
    device = _make_device(True)
    monkeypatch.setattr("builtins.input", lambda prompt="": "n")
    options = tdgl.SolverOptions(
        solve_time=50, dt_init=1e-4, save_every=50, steps_per_chunk=50,
        field_units="uT", current_units="uA",
        pause_on_interrupt=True,
        output_file=str(tmp_path / "decline.h5"),
    )
    solver, _ = _interrupting_solver(device, options, interrupt_at=3)
    solution = solver.solve()
    assert solution is not None
    assert float(solution.times[-1]) < 50.0


def test_interrupt_during_thermalization_returns_none(tmp_path):
    """A cancel during the thermalization stage aborts the run with no
    data (the reference returns None, ``tdgl/solver/solver.py:716-721``)."""
    device = _make_device(True)
    options = tdgl.SolverOptions(
        solve_time=50, skip_time=50, dt_init=1e-4, save_every=50,
        steps_per_chunk=50,
        field_units="uT", current_units="uA",
        pause_on_interrupt=False,
        output_file=str(tmp_path / "therm.h5"),
    )
    solver, calls = _interrupting_solver(device, options, interrupt_at=2)
    solution = solver.solve()
    assert solution is None
