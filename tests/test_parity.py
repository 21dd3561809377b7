"""Trajectory parity between the jitted step and the reference-semantics
NumPy/SciPy oracle (``tests/oracle.py``).

This is the executable form of the BASELINE.md parity row ("psi trajectory
matching the reference to L2 <= 1e-6"): both integrators run at a fixed time
step (adaptive off) in float64 on the same mesh from identical initial
conditions, and psi is compared in relative L2 at checkpoints along the way.
"""

import numpy as np
import pytest

import tdgl_tpu as tdgl
from tdgl_tpu.solver.solver import TDGLSolver
from tdgl_tpu.utils.jaxio import to_numpy

from oracle import (  # tests/ dir is on sys.path under pytest
    OracleRunner,
    ReferenceOracle,
)


def _psi_complex(state_psi):
    """ELL-state psi is a split-complex ``(N, 2)`` re/im pair."""
    p = to_numpy(state_psi)
    return (p[..., 0] + 1j * p[..., 1]).astype(complex)


def _run_parity(device, total_steps, dt, applied_field_mT=0.0,
                terminal_currents=None, rtol=1e-6):
    options = tdgl.SolverOptions(
        solve_time=1e9,
        dt_init=dt,
        adaptive=False,
        save_every=10_000,
        steps_per_chunk=200,
        field_units="mT",
        current_units="uA",
        dtype="float64",
        poisson_tolerance=1e-12,
    )
    solver = TDGLSolver(
        device, options,
        applied_vector_potential=applied_field_mT,
        terminal_currents=terminal_currents,
    )
    state = solver._initial_state()

    oracle = ReferenceOracle(
        solver.host_op,
        gamma=solver.cfg.gamma,
        u=solver.cfg.u,
        A_edge=to_numpy(state.A_applied),
        epsilon=to_numpy(state.epsilon),
        mu_boundary=to_numpy(state.mu_boundary),
        fix_psi=len(solver.host_op.fixed_sites) > 0,
    )
    psi_ref = _psi_complex(state.psi)
    mu_ref = to_numpy(state.mu).astype(float)

    chunk = solver.chunk_size
    assert total_steps % chunk == 0
    steps_done = 0
    for _ in range(total_steps // chunk):
        state, outputs, exported = solver.chunk_fn(state)
        for _ in range(chunk):
            psi_ref, mu_ref, J_s_ref, J_n_ref = oracle.step(
                psi_ref, mu_ref, dt
            )
        steps_done += chunk
        ex = {k: to_numpy(v) for k, v in exported.items()}
        psi_jit = ex["psi_real"] + 1j * ex["psi_imag"]
        diag = ex["diagnostics"]
        assert not bool(diag[5]), f"jitted solver failed at {steps_done}"
        assert int(diag[3]) == steps_done
        err = np.linalg.norm(psi_jit - psi_ref) / np.linalg.norm(psi_ref)
        assert err <= rtol, (
            f"psi L2 parity {err:.3e} > {rtol} after {steps_done} steps"
        )
    # Cross-check the other observables at the final step too.
    assert np.linalg.norm(ex["mu"] - mu_ref) <= 1e-6 * max(
        np.linalg.norm(mu_ref), 1e-12
    )
    assert np.allclose(ex["supercurrent"], J_s_ref, atol=1e-8)
    assert np.allclose(ex["normal_current"], J_n_ref, atol=1e-8)
    return steps_done


@pytest.mark.slow
def test_psi_trajectory_parity_box(box_device):
    """Field-cooled square film (no terminals): 1000 fixed-dt steps of real
    vortex-entry dynamics match the reference-step oracle to L2 <= 1e-6."""
    _run_parity(
        box_device, total_steps=1000, dt=2e-4, applied_field_mT=0.05,
    )


@pytest.mark.slow
def test_psi_trajectory_parity_transport(transport_device):
    """Transport geometry (terminals, Dirichlet psi rows, Neumann mu rows):
    600 fixed-dt steps with bias current + field match the oracle."""
    _run_parity(
        transport_device, total_steps=600, dt=2e-4, applied_field_mT=0.01,
        terminal_currents=dict(source=5, drain=-5),
    )


@pytest.mark.slow
def test_adaptive_dt_parity(box_device):
    """Adaptive time stepping matches the reference's window-averaged dt
    selection (``solver.py:698-707``) step for step: the dt sequence AND the
    psi trajectory agree with the oracle runner in float64."""
    dt_init, dt_max = 2e-4, 5e-4
    total_steps = 600
    options = tdgl.SolverOptions(
        solve_time=1e9,
        dt_init=dt_init,
        dt_max=dt_max,
        adaptive=True,
        save_every=10_000,
        steps_per_chunk=100,
        field_units="mT",
        current_units="uA",
        dtype="float64",
        poisson_tolerance=1e-12,
    )
    solver = TDGLSolver(box_device, options,
                        applied_vector_potential=0.05)
    state = solver._initial_state()

    oracle = ReferenceOracle(
        solver.host_op,
        gamma=solver.cfg.gamma,
        u=solver.cfg.u,
        A_edge=to_numpy(state.A_applied),
        epsilon=to_numpy(state.epsilon),
        mu_boundary=to_numpy(state.mu_boundary),
        fix_psi=len(solver.host_op.fixed_sites) > 0,
    )
    runner = OracleRunner(
        oracle, dt_init=dt_init, dt_max=dt_max, adaptive=True,
        adaptive_window=options.adaptive_window,
        max_solve_retries=options.max_solve_retries,
        multiplier=options.adaptive_time_step_multiplier,
    )
    psi_ref = _psi_complex(state.psi)
    mu_ref = to_numpy(state.mu).astype(float)

    chunk = solver.chunk_size
    dts_jit = []
    for _ in range(total_steps // chunk):
        state, outputs, exported = solver.chunk_fn(state)
        dts_jit.append(to_numpy(outputs.dt))
    dts_ref = []
    for _ in range(total_steps):
        out = runner.step(psi_ref, mu_ref)
        psi_ref, mu_ref = out["psi"], out["mu"]
        dts_ref.append(out["dt"])
        # Retry decisions are knife-edge (sign of a discriminant); a single
        # retry would let 1-ulp differences fork the dt sequence. dt_max is
        # chosen so none occur — retry parity is covered separately by
        # test_retry_parity.
        assert out["retries"] == 0
    ex = {k: to_numpy(v) for k, v in exported.items()}
    assert not bool(ex["diagnostics"][5])
    dts_jit = np.concatenate(dts_jit)
    # dt must have actually adapted (or the test proves nothing)...
    assert dts_jit.max() >= 2 * dt_init
    # ...and match the oracle's selection step for step.
    np.testing.assert_allclose(dts_jit, dts_ref, rtol=1e-6)
    psi_jit = ex["psi_real"] + 1j * ex["psi_imag"]
    err = np.linalg.norm(psi_jit - psi_ref) / np.linalg.norm(psi_ref)
    assert err <= 1e-6


@pytest.mark.slow
def test_retry_parity(box_device):
    """The discriminant-retry loop (``solver.py:441-487``) matches the
    oracle: from an identical state with a deliberately huge tentative dt,
    both implementations reject the same trial steps and settle on the same
    reduced dt and the same psi."""
    dt_init = 5.0  # far above stability: the first trial must fail
    options = tdgl.SolverOptions(
        solve_time=1e9,
        dt_init=dt_init,
        dt_max=dt_init,
        adaptive=True,
        save_every=10_000,
        steps_per_chunk=1,
        field_units="mT",
        current_units="uA",
        dtype="float64",
        poisson_tolerance=1e-12,
    )
    solver = TDGLSolver(box_device, options,
                        applied_vector_potential=0.08)
    state = solver._initial_state()
    state, outputs, exported = solver.chunk_fn(state)
    ex = {k: to_numpy(v) for k, v in exported.items()}
    assert not bool(ex["diagnostics"][5])

    oracle = ReferenceOracle(
        solver.host_op,
        gamma=solver.cfg.gamma,
        u=solver.cfg.u,
        A_edge=to_numpy(solver._initial_state().A_applied),
        epsilon=np.asarray(solver.epsilon, float),
        mu_boundary=np.zeros(len(solver.host_op.boundary_edge_indices)),
        fix_psi=len(solver.host_op.fixed_sites) > 0,
    )
    runner = OracleRunner(
        oracle, dt_init=dt_init, dt_max=dt_init, adaptive=True,
        max_solve_retries=options.max_solve_retries,
        multiplier=options.adaptive_time_step_multiplier,
    )
    psi0 = np.ones(len(solver.mesh.sites), complex)
    out = runner.step(psi0, np.zeros(len(solver.mesh.sites)))
    assert out["retries"] >= 1  # the retry path actually ran
    dt_jit = float(to_numpy(outputs.dt)[0])
    assert dt_jit == pytest.approx(out["dt"], rel=1e-12)
    psi_jit = ex["psi_real"] + 1j * ex["psi_imag"]
    err = (np.linalg.norm(psi_jit - out["psi"])
           / np.linalg.norm(out["psi"]))
    assert err <= 1e-9


@pytest.mark.slow
def test_screening_fixed_point_parity():
    """The screening fixed point (Polyak mode, per-edge error norm — the
    reference's exact scheme, ``solver.py:522-578,654-688``) matches the
    oracle runner: psi, A_induced, and the per-step iteration counts agree
    in float64 at fixed dt."""
    xi = 0.25
    layer = tdgl.Layer(coherence_length=xi, london_lambda=0.8,
                       thickness=0.1)
    film = tdgl.Polygon("film", points=tdgl.geometry.box(2.0, 1.0,
                                                         points=101))
    device = tdgl.Device("scr", layer=layer, film=film, length_units="um")
    device.make_mesh(max_edge_length=xi / 1.2, smooth=20)
    dt = 5e-4
    total_steps = 20
    # Tolerance 1e-4 sits inside the fixed point's geometric-contraction
    # phase. Below ~3e-5 the reference's Polyak scheme enters its
    # slow-crawl regime on this geometry (the psi iterate itself contracts
    # at ~0.98/iteration) — the documented weakness that motivated the
    # Anderson accelerator — and per-edge error ratios on small-|A| edges
    # stall; both implementations share that behavior, but a knife-edge
    # tolerance would make iteration counts flaky.
    options = tdgl.SolverOptions(
        solve_time=1e9,
        dt_init=dt,
        adaptive=False,
        save_every=10_000,
        steps_per_chunk=10,
        field_units="mT",
        current_units="uA",
        dtype="float64",
        include_screening=True,
        screening_solver="polyak",
        screening_error_norm="per_edge",
        screening_tolerance=1e-4,
        screening_step_size=0.5,
        screening_step_drag=1.0,
        screening_cg_iterations=80,
        poisson_tolerance=1e-12,
    )
    solver = TDGLSolver(device, options, applied_vector_potential=1.0)
    state = solver._initial_state()

    oracle = ReferenceOracle(
        solver.host_op,
        gamma=solver.cfg.gamma,
        u=solver.cfg.u,
        A_edge=to_numpy(state.A_applied),
        epsilon=to_numpy(state.epsilon),
        mu_boundary=to_numpy(state.mu_boundary),
        fix_psi=len(solver.host_op.fixed_sites) > 0,
    )
    runner = OracleRunner(
        oracle, dt_init=dt, dt_max=dt, adaptive=False,
        screening=True,
        screening_weights=np.asarray(solver._screening_weights),
        A_applied=to_numpy(state.A_applied),
        edge_centers=np.asarray(solver.mesh.edge_mesh.centers),
        sites=np.asarray(solver.mesh.sites),
        screening_tolerance=options.screening_tolerance,
        alpha=options.screening_step_size,
        beta=options.screening_step_drag,
        max_iterations_per_step=options.max_iterations_per_step,
    )
    psi_ref = _psi_complex(state.psi)
    mu_ref = to_numpy(state.mu).astype(float)
    A_ind_ref = np.zeros_like(to_numpy(state.A_induced))

    iters_jit = []
    for _ in range(total_steps // solver.chunk_size):
        state, outputs, exported = solver.chunk_fn(state)
        iters_jit.append(to_numpy(outputs.screening_iterations))
    iters_ref = []
    for _ in range(total_steps):
        out = runner.step(psi_ref, mu_ref, A_induced=A_ind_ref)
        psi_ref, mu_ref, A_ind_ref = (out["psi"], out["mu"],
                                      out["A_induced"])
        iters_ref.append(out["screening_iterations"])
    ex = {k: to_numpy(v) for k, v in exported.items()}
    assert not bool(ex["diagnostics"][5]), "screened solver failed"
    # The fixed point did real work (multiple iterations per step).
    assert max(iters_ref) >= 3
    np.testing.assert_array_equal(np.concatenate(iters_jit), iters_ref)
    psi_jit = ex["psi_real"] + 1j * ex["psi_imag"]
    err = np.linalg.norm(psi_jit - psi_ref) / np.linalg.norm(psi_ref)
    assert err <= 1e-6, f"psi parity {err:.3e}"
    A_jit = ex["induced_vector_potential"]
    scale = max(np.abs(A_ind_ref).max(), 1e-12)
    assert np.abs(A_jit - A_ind_ref).max() / scale < 1e-5
