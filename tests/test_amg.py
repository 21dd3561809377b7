"""Two-level AMG preconditioner: correctness and iteration advantage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdgl_tpu.device.meshing import generate_mesh
from tdgl_tpu.fv.mesh import Mesh
from tdgl_tpu.fv.operators import build_operators
from tdgl_tpu.geometry import box, circle
from tdgl_tpu.models import gtdgl
from tdgl_tpu.ops.amg import build_amg
from tdgl_tpu.ops.cg import solve_mu_poisson


@pytest.fixture(scope="module")
def problem():
    pts, tris = generate_mesh(box(20), hole_coords=[circle(2.5)],
                              min_points=4000)
    mesh = Mesh.from_triangulation(pts, tris)
    op_host = build_operators(mesh, dtype=np.float32)
    op = jax.tree.map(jnp.asarray, op_host)
    rng = np.random.default_rng(0)
    F = rng.normal(size=len(op_host.edges)).astype(np.float32)
    rhs = gtdgl.divergence_on_sites(op, jnp.asarray(F))
    return op_host, op, rhs


def test_amg_aggregation_covers_all_sites(problem):
    op_host, _, _ = problem
    amg = build_amg(op_host, coarsening=32)
    n = len(op_host.areas)
    assert amg.cluster_ids.shape == (n,)
    assert amg.cluster_ids.min() == 0
    nc = amg.cluster_ids.max() + 1
    assert amg.Ac_inv.shape == (nc, nc)
    # every aggregate is non-empty
    assert len(np.unique(amg.cluster_ids)) == nc


def test_amg_solution_matches_jacobi(problem):
    op_host, op, rhs = problem
    n = len(op_host.areas)
    amg = jax.tree.map(jnp.asarray, build_amg(op_host, coarsening=32))
    jac = solve_mu_poisson(op, rhs, jnp.zeros(n), tol=1e-6, maxiter=5000)
    ml = solve_mu_poisson(op, rhs, jnp.zeros(n), tol=1e-6, maxiter=5000,
                          amg=amg)
    a = np.array(jac.x)
    b = np.array(ml.x)
    a = a - a.mean()
    b = b - b.mean()
    scale = max(np.abs(a).max(), 1e-12)
    assert np.abs(a - b).max() / scale < 1e-3


def test_amg_iteration_advantage(problem):
    op_host, op, rhs = problem
    n = len(op_host.areas)
    amg = jax.tree.map(jnp.asarray, build_amg(op_host, coarsening=32))
    jac = solve_mu_poisson(op, rhs, jnp.zeros(n), tol=1e-6, maxiter=5000)
    ml = solve_mu_poisson(op, rhs, jnp.zeros(n), tol=1e-6, maxiter=5000,
                          amg=amg)
    assert int(ml.iterations) < int(jac.iterations) / 4
    assert float(ml.residual_norm) <= 1e-5
