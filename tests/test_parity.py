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

from oracle import ReferenceOracle  # tests/ dir is on sys.path under pytest


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
    psi_ref = to_numpy(state.psi).astype(complex)
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
