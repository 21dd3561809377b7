"""Validate the ELL operator tables and jax physics kernels against SciPy
sparse reference implementations and physical invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tdgl_tpu.device.meshing import generate_mesh
from tdgl_tpu.fv.mesh import Mesh
from tdgl_tpu.fv.operators import (
    build_operators,
    divergence_matrix,
    laplacian_matrix,
)
from tdgl_tpu.geometry import box, circle
from tdgl_tpu.models import gtdgl
from tdgl_tpu.ops.cg import solve_mu_poisson

jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="module")
def mesh():
    pts, tris = generate_mesh(box(8), hole_coords=[circle(1.2)],
                              min_points=900)
    return Mesh.from_triangulation(pts, tris)


@pytest.fixture(scope="module")
def op(mesh):
    rng = np.random.default_rng(0)
    boundary = mesh.boundary_indices
    fixed = rng.choice(boundary, size=5, replace=False)
    return build_operators(mesh, fixed_sites=fixed)


def _device_op(op):
    return jax.tree.map(jnp.asarray, op)


def test_laplacian_matches_scipy(mesh, op):
    rng = np.random.default_rng(1)
    psi = rng.normal(size=len(mesh.sites)) + 1j * rng.normal(size=len(mesh.sites))
    A_edge = rng.normal(size=(len(op.edges), 2)) * 0.3
    a = np.sum(A_edge * op.edge_directions, axis=1)
    U = np.exp(-1j * a)
    L = laplacian_matrix(op, link_phases=U, fix_psi=True)
    expected = L @ psi
    jop = _device_op(op)
    U_jax = gtdgl.edge_link_phases(jnp.asarray(A_edge), jop.edge_directions)
    np.testing.assert_allclose(np.asarray(gtdgl.unpack(U_jax)), U, atol=1e-12)
    got = gtdgl.covariant_laplacian(jop, U_jax, gtdgl.pack(jnp.asarray(psi)))
    np.testing.assert_allclose(np.asarray(gtdgl.unpack(got)), expected,
                               atol=1e-10)


def test_divergence_matches_scipy(mesh, op):
    rng = np.random.default_rng(2)
    F = rng.normal(size=len(op.edges))
    D = divergence_matrix(op)
    expected = D @ F
    got = gtdgl.divergence_on_sites(_device_op(op), jnp.asarray(F))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-10)


def test_laplacian_row_sums_zero(op):
    """The Neumann Laplacian (no link, no fixed rows) annihilates constants."""
    n = len(op.areas)
    ones = gtdgl.pack(jnp.ones(n, dtype=jnp.complex128))
    op_nofix = op._replace(fixed_mask=np.zeros(n),
                           fixed_sites=np.array([], dtype=np.int32))
    jop = _device_op(op_nofix)
    U = gtdgl.pack(jnp.ones(len(op.edges), dtype=jnp.complex128))
    out = gtdgl.covariant_laplacian(jop, U, ones)
    np.testing.assert_allclose(np.asarray(gtdgl.unpack(out)), 0.0, atol=1e-10)


def test_div_grad_equals_laplacian(mesh, op):
    """div(grad(x)) must equal the scalar Laplacian (FV identity)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=len(mesh.sites))
    jop = _device_op(op)
    gx = gtdgl.gradient_on_edges(jop, jnp.asarray(x))
    div_grad = gtdgl.divergence_on_sites(jop, gx)
    S = gtdgl.scalar_laplacian_sym(jop, jnp.asarray(x))
    lap = np.asarray(S) / op.areas
    np.testing.assert_allclose(np.asarray(div_grad), lap, atol=1e-10)


def test_supercurrent_zero_for_uniform_psi(op):
    """A uniform order parameter with A=0 carries no supercurrent."""
    jop = _device_op(op)
    psi = gtdgl.pack(jnp.ones(len(op.areas), dtype=jnp.complex128))
    U = gtdgl.pack(jnp.ones(len(op.edges), dtype=jnp.complex128))
    J = gtdgl.supercurrent_on_edges(jop, U, psi)
    np.testing.assert_allclose(np.asarray(J), 0.0, atol=1e-12)


def test_supercurrent_phase_gradient(mesh, op):
    """psi = exp(i q x) at A=0 carries J ~ q along x."""
    q = 0.15
    sites = mesh.sites
    psi = np.exp(1j * q * sites[:, 0])
    jop = _device_op(op)
    U = gtdgl.pack(jnp.ones(len(op.edges), dtype=jnp.complex128))
    J = np.asarray(gtdgl.supercurrent_on_edges(jop, U,
                                               gtdgl.pack(jnp.asarray(psi))))
    # J_e should approximate q * cos(angle of edge with x)
    dirs = op.edge_directions / np.linalg.norm(op.edge_directions, axis=1,
                                               keepdims=True)
    expected = q * dirs[:, 0]
    np.testing.assert_allclose(J, expected, atol=5e-3)


def test_neumann_term_total_flux(mesh, op):
    """sum_i a_i * (N_bl @ mu_b)_i = total boundary flux = sum_b len_b * J_b."""
    rng = np.random.default_rng(4)
    B = len(op.boundary_edge_indices)
    mu_b = rng.normal(size=B)
    jop = _device_op(op)
    term = np.asarray(gtdgl.neumann_boundary_term(jop, jnp.asarray(mu_b),
                                                  len(op.areas)))
    total = np.sum(op.areas * term)
    lengths = op.edge_lengths[op.boundary_edge_indices]
    np.testing.assert_allclose(total, np.sum(lengths * mu_b), rtol=1e-12)


def test_cg_matches_direct_solve(mesh, op):
    """CG Poisson solve agrees with a direct sparse solve up to a constant."""
    rng = np.random.default_rng(5)
    n = len(op.areas)
    # Compatible RHS: divergence of a random edge field has zero area-sum.
    F = rng.normal(size=len(op.edges))
    rhs = divergence_matrix(op) @ F
    assert abs(np.sum(op.areas * rhs)) < 1e-8

    jop = _device_op(op)
    result = solve_mu_poisson(jop, jnp.asarray(rhs), jnp.zeros(n),
                              tol=1e-12, maxiter=2000)
    mu_cg = np.array(result.x)

    # Direct solve of the singular system via least squares on S.
    w = op.dual_edge_lengths / op.edge_lengths
    e0, e1 = op.edges[:, 0], op.edges[:, 1]
    rows = np.concatenate([e0, e1, e0, e1])
    cols = np.concatenate([e1, e0, e0, e1])
    vals = np.concatenate([w, w, -w, -w])
    # Pin mu[0] = 0 to remove the constant null space, then direct-solve.
    S = sp.lil_array(sp.csr_array((vals, (rows, cols)), shape=(n, n)))
    b = np.array(op.areas * rhs)
    S[0, :] = 0.0
    S[0, 0] = 1.0
    b[0] = 0.0
    mu_direct = spla.spsolve(sp.csc_matrix(S), b)
    mu_direct -= mu_direct.mean()
    mu_cg -= mu_cg.mean()
    scale = np.abs(mu_direct).max()
    np.testing.assert_allclose(mu_cg, mu_direct, atol=1e-6 * max(scale, 1))
    assert result.iterations < 2000


def test_cg_warm_start_fast(mesh, op):
    """Warm-started CG should converge in far fewer iterations."""
    rng = np.random.default_rng(6)
    F = rng.normal(size=len(op.edges))
    rhs = divergence_matrix(op) @ F
    jop = _device_op(op)
    n = len(op.areas)
    cold = solve_mu_poisson(jop, jnp.asarray(rhs), jnp.zeros(n), tol=1e-8)
    # Perturb the RHS slightly: warm start from previous solution.
    rhs2 = rhs * 1.01
    warm = solve_mu_poisson(jop, jnp.asarray(rhs2), cold.x, tol=1e-8)
    assert int(warm.iterations) < 0.85 * int(cold.iterations)


def test_psi_update_preserves_equilibrium(op):
    """psi=1 (Meissner state, A=0, eps=1) is a fixed point of the update."""
    n = len(op.areas)
    op_nofix = op._replace(fixed_mask=np.zeros(n),
                           fixed_sites=np.array([], dtype=np.int32))
    jop = _device_op(op_nofix)
    psi = gtdgl.pack(jnp.ones(n, dtype=jnp.complex128))
    U = gtdgl.pack(jnp.ones(len(op.edges), dtype=jnp.complex128))
    result = gtdgl.implicit_euler_psi(
        jop, U, psi, jnp.sum(psi * psi, axis=-1), jnp.zeros(n), jnp.ones(n),
        gamma=10.0, u=5.79, dt=0.1,
    )
    assert bool(result.ok)
    np.testing.assert_allclose(np.asarray(gtdgl.unpack(result.psi)), 1.0,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(result.abs_sq_psi), 1.0, atol=1e-12)


def test_psi_update_relaxes_to_equilibrium(op):
    """From a perturbed state with eps=1, |psi| relaxes toward 1.

    Uses gamma=0: for large gamma the gTDGL amplitude relaxation is strongly
    damped by the gamma^2/2 d|psi|^2/dt term, which is correct physics but
    makes the test needlessly slow.
    """
    rng = np.random.default_rng(7)
    n = len(op.areas)
    op_nofix = op._replace(fixed_mask=np.zeros(n),
                           fixed_sites=np.array([], dtype=np.int32))
    jop = _device_op(op_nofix)
    psi = gtdgl.pack(
        jnp.asarray(0.5 * np.ones(n) + 0.01 * rng.normal(size=n) + 0j)
    )
    U = gtdgl.pack(jnp.ones(len(op.edges), dtype=jnp.complex128))
    eps = jnp.ones(n)
    mu = jnp.zeros(n)

    def amp(p):
        return jnp.sqrt(jnp.sum(p * p, axis=-1))

    err0 = float(jnp.abs(amp(psi) - 1).max())
    # dt must respect the explicit-Laplacian diffusion limit dt ~< u h^2 / 4.
    step = jax.jit(
        lambda psi: gtdgl.implicit_euler_psi(
            jop, U, psi, jnp.sum(psi * psi, axis=-1), mu, eps, gamma=0.0,
            u=5.79, dt=0.02,
        )
    )
    for _ in range(2500):
        res = step(psi)
        psi = res.psi
    assert bool(res.ok)
    err1 = float(jnp.abs(amp(psi) - 1).max())
    assert err1 < 1e-6 < err0
