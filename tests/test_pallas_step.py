"""Parity of the fused Pallas step kernels (ops.pallas_step) vs the
roll-chain stencil formulation — same physics, one HBM pass per plane.

Runs in interpreter mode on the CPU conftest mesh (the solver enables the
compiled Mosaic path only on real TPUs)."""

import jax.numpy as jnp
import numpy as np
import pytest

import tdgl_tpu as tdgl
from tdgl_tpu.geometry import box
from tdgl_tpu.models import gtdgl_stencil as gs
from tdgl_tpu.solver.solver import TDGLSolver
from tdgl_tpu.utils.jaxio import to_numpy


@pytest.fixture(scope="module")
def structured_solver_factory():
    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2.0,
                       thickness=0.1, conductivity=10.0)
    film = tdgl.Polygon("film", points=box(10)).resample(100)
    device = tdgl.Device("ps", layer=layer, film=film, length_units="um")
    device.make_mesh(min_points=400, structured=True)

    def make(**overrides):
        kwargs = dict(
            solve_time=1e9, dt_init=1e-3, adaptive=False,
            save_every=20, steps_per_chunk=20, dtype="float32",
            field_units="mT", current_units="uA",
        )
        kwargs.update(overrides)
        options = tdgl.SolverOptions(**kwargs)
        return TDGLSolver(device, options, applied_vector_potential=0.5)

    return make


def test_fused_kernel_parity(structured_solver_factory):
    """fused_psi_update / fused_poisson_rhs match the gs.* formulation to
    f32 rounding on a live state."""
    from tdgl_tpu.ops.pallas_step import fused_poisson_rhs, fused_psi_update

    solver = structured_solver_factory()
    sten = solver.sten
    state = solver._initial_state()
    state, _, _ = solver.chunk_fn(state)  # advance to a live state
    U = gs.edge_link_phases(sten, state.A_applied)
    pr, pi, mu = state.psi_r, state.psi_i, state.mu
    old_sq = pr * pr + pi * pi
    dt = jnp.float32(1e-3)

    ref = gs.implicit_euler_psi(sten, U, pr, pi, old_sq, mu, state.epsilon,
                                solver.cfg.gamma, solver.cfg.u, dt)
    got_r, got_i, got_sq, ok = fused_psi_update(
        solver.cfg.gamma, solver.cfg.u, sten, U, pr, pi, mu,
        state.epsilon, dt)
    assert np.abs(to_numpy(got_r) - to_numpy(ref.psi_r)).max() < 3e-5
    assert np.abs(to_numpy(got_i) - to_numpy(ref.psi_i)).max() < 3e-5
    assert np.abs(to_numpy(got_sq) - to_numpy(ref.abs_sq_psi)).max() < 3e-5
    assert bool(to_numpy(ok)) == bool(to_numpy(ref.ok))

    J_s = gs.supercurrent_on_edges(sten, U, ref.psi_r, ref.psi_i)
    rhs_ref = gs.poisson_rhs(sten, J_s, state.dA_dt, state.neumann_term)
    rhs_got = fused_poisson_rhs(sten, U, ref.psi_r, ref.psi_i,
                                state.dA_dt, state.neumann_term)
    scale = float(np.abs(to_numpy(rhs_ref)).max())
    assert np.abs(to_numpy(rhs_got) - to_numpy(rhs_ref)).max() < 3e-5 * max(
        scale, 1.0)


def test_fused_chunk_trajectory_parity(structured_solver_factory):
    """A full chunked solve with pallas_step=True tracks the default
    formulation step for step (fixed dt, f32: only rounding-order
    differences)."""
    ref_solver = structured_solver_factory(pallas_step=False)
    ref_state = ref_solver._initial_state()
    fused_solver = structured_solver_factory(pallas_step=True)
    fused_state = fused_solver._initial_state()
    for _ in range(3):
        ref_state, _, _ = ref_solver.chunk_fn(ref_state)
        fused_state, outputs, _ = fused_solver.chunk_fn(fused_state)
    assert int(to_numpy(fused_state.step)[None][0]) == 60
    scale = max(float(np.abs(to_numpy(ref_state.psi_r)).max()), 1e-12)
    err = np.abs(to_numpy(fused_state.psi_r)
                 - to_numpy(ref_state.psi_r)).max() / scale
    assert err < 5e-4, f"fused trajectory diverged: {err:.2e}"
    mu_scale = max(float(np.abs(to_numpy(ref_state.mu)).max()), 1e-12)
    mu_err = np.abs(to_numpy(fused_state.mu)
                    - to_numpy(ref_state.mu)).max() / mu_scale
    assert mu_err < 5e-3, f"fused mu diverged: {mu_err:.2e}"


def test_pallas_step_auto_off_on_cpu(structured_solver_factory):
    """Auto resolution keeps the fused path off when not on a real TPU."""
    solver = structured_solver_factory()
    assert solver.cfg.use_pallas_step is False


def test_spatial_sharding_disables_pallas_step(structured_solver_factory):
    """shard_solver_spatially rebuilds the chunk without the pallas path
    (a pallas_call cannot be auto-partitioned by the SPMD partitioner)."""
    import jax

    from tdgl_tpu.parallel import shard_solver_spatially, spatial_device_mesh

    solver = structured_solver_factory(pallas_step=True)
    assert solver.cfg.use_pallas_step is True
    mesh = spatial_device_mesh(jax.devices())
    shard_solver_spatially(solver, mesh, allow_replicated=True)
    assert solver.cfg.use_pallas_step is False
    state = solver.chunk_fn(solver._initial_state())[0]
    assert np.isfinite(to_numpy(state.psi_r)).all()
