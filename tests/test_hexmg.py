"""Deep smoothed-aggregation multigrid (ops/hexmg.py) convergence gates."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tdgl_tpu as tdgl
from tdgl_tpu.fv.stencil_operators import build_stencil_operators
from tdgl_tpu.geometry import box
from tdgl_tpu.models.gtdgl_stencil import scalar_laplacian_sym
from tdgl_tpu.ops.cg import cg_solve
from tdgl_tpu.ops.hexmg import build_hexmg, make_hexmg_apply


@pytest.fixture(scope="module")
def poisson_problem():
    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2.0,
                       thickness=0.1, conductivity=10.0)
    film = tdgl.Polygon("film", points=box(30)).resample(250)
    device = tdgl.Device("mg", layer=layer, film=film, length_units="um")
    device.make_mesh(min_points=5000, structured=True)
    sten, maps = build_stencil_operators(device.mesh, dtype=np.float32)
    mg = build_hexmg(sten, maps, device.mesh)
    sten_j = jax.tree.map(jnp.asarray, sten)
    valid = jnp.asarray(sten.valid)
    n_valid = float(np.asarray(sten.valid).sum())

    def project(v):
        return (v - jnp.sum(v * valid.astype(v.dtype)) / n_valid) \
            * valid.astype(v.dtype)

    rng = np.random.default_rng(3)
    b = rng.normal(size=maps.shape).astype(np.float32) * np.asarray(
        sten.valid
    )
    return sten_j, mg, maps, project, b


def test_hierarchy_structure(poisson_problem):
    sten, mg, maps, project, b = poisson_problem
    # Halving chain reaches a small dense coarsest level.
    assert len(mg.shapes) >= 3
    R0, C0 = mg.shapes[0]
    for (Ra, Ca), (Rb, Cb) in zip(mg.shapes, mg.shapes[1:]):
        assert (Rb, Cb) == (Ra // 2, Ca // 2)
    nc = mg.shapes[-1][0] * mg.shapes[-1][1]
    assert nc <= 4 * 1000  # dense coarsest stays small at any mesh size
    # Fine level is the 6-offset hex stencil + diagonal.
    assert len(mg.offsets[0]) == 7


def test_f32_convergence(poisson_problem):
    """Cold-started CG with the deep-MG preconditioner converges in a
    handful of iterations (the two-level AMG it replaced needed ~20)."""
    sten, mg, maps, project, b = poisson_problem
    apply_mg = make_hexmg_apply(0.9)

    def apply_A(x):
        return -scalar_laplacian_sym(sten, x)

    res = cg_solve(apply_A, project(jnp.asarray(b)),
                   jnp.zeros(maps.shape, jnp.float32), tol=3e-6,
                   maxiter=100, precond=lambda r: apply_mg(mg, r),
                   project_fn=project)
    assert int(res.iterations) <= 10
    # The requested 3e-6 clamps to the f32 precision floor 50*eps ~ 6e-6
    # (see cg_solve); assert against the floor, not the request.
    assert float(res.residual_norm) < 6e-6


def test_f64_deep_tolerance(poisson_problem):
    """The f64 path (full-precision cycle) reaches near-machine tolerances:
    a bf16-rounded preconditioner would stall CG well above 1e-11."""
    sten, mg, maps, project, b = poisson_problem
    apply_mg = make_hexmg_apply(0.9)
    sten64 = jax.tree.map(
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        sten,
    )

    def apply_A(x):
        return -scalar_laplacian_sym(sten64, x)

    b64 = project(jnp.asarray(b, jnp.float64))
    res = cg_solve(apply_A, b64, jnp.zeros(maps.shape, jnp.float64),
                   tol=1e-11, maxiter=200,
                   precond=lambda r: apply_mg(mg, r), project_fn=project)
    assert float(res.residual_norm) < 1e-10
    assert int(res.iterations) <= 30


def test_symmetric_level_apply_parity(poisson_problem):
    """The symmetric-pair level apply (reads only the canonical half of
    the weight planes, derives mirrored terms as shifted products) matches
    a direct all-offsets dense evaluation at every level, and matches
    ``-scalar_laplacian_sym`` (an independent assembly path) at level 0."""
    from tdgl_tpu.ops.hexmg import level_apply

    sten, mg, maps, project, b = poisson_problem
    rng = np.random.default_rng(7)
    for lvl in range(len(mg.offsets) - 1):
        offs = mg.offsets[lvl]
        W = np.asarray(mg.level_arrays[lvl]["W"], np.float64)
        R, C = mg.shapes[lvl]
        x = rng.standard_normal((R, C))
        ref = np.zeros_like(x)
        for i, (dr, dc) in enumerate(offs):
            sh = np.zeros_like(x)
            sh[max(-dr, 0):R + min(-dr, 0) or None,
               max(-dc, 0):C + min(-dc, 0) or None] = x[
                max(dr, 0):R + min(dr, 0) or None,
                max(dc, 0):C + min(dc, 0) or None]
            ref += W[i] * sh
        got = np.asarray(level_apply(mg, lvl, jnp.asarray(x)))
        rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)
        # Coarser Galerkin levels carry ~ulp-level float asymmetry
        # (scipy triple products); the symmetric apply effectively uses
        # the exactly-symmetrized operator, so allow roundoff-scale slack.
        assert rel < 1e-5, f"level {lvl}: rel {rel:.2e}"
    # Level 0 cross-check against the stencil backend's own Laplacian:
    # A = -S assembled from the same FV edge weights.
    x0 = rng.standard_normal(maps.shape).astype(np.float32)
    got0 = np.asarray(level_apply(mg, 0, jnp.asarray(x0)))
    ref0 = -np.asarray(scalar_laplacian_sym(sten, jnp.asarray(x0)))
    np.testing.assert_allclose(got0, ref0, rtol=1e-4, atol=1e-4)


def test_mg_richardson_fixed_cycles(poisson_problem):
    """Fixed-cycle MG-Richardson (the reduction-free smooth map used inside
    the screening fixed point and for poisson_fixed_iterations) matches the
    tolerance-stopped solve."""
    from tdgl_tpu.ops.cg import mg_richardson_grid

    sten, mg, maps, project, b = poisson_problem
    # mg_richardson_grid takes the raw (area-scaled) rhs convention:
    # b = -area * rhs  =>  rhs = -b / area.
    rhs = -jnp.asarray(b) / jnp.maximum(sten.area, 1e-30)
    x0 = jnp.zeros(maps.shape, jnp.float32)
    ref = mg_richardson_grid(sten, rhs, x0, mg, tol=3e-6, maxiter=50)
    fixed = mg_richardson_grid(sten, rhs, x0, mg,
                               fixed_iters=int(ref.iterations) + 2)
    assert float(fixed.residual_norm) <= max(
        3e-6, 2.0 * float(ref.residual_norm)
    )
    # Extra f32 cycles jitter x at the precision floor (~1e-4 of the
    # O(10) solution scale); the solves agree to that floor.
    np.testing.assert_allclose(
        np.asarray(fixed.x), np.asarray(ref.x), atol=1e-3,
    )
