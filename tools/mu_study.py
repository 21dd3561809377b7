"""CPU convergence study for the mu-Poisson solve during live dynamics.

Answers, with the real operator and real warm starts (not random systems):

1. How many fixed MG-Richardson cycles / MG-preconditioned-CG iterations
   does a warm-started production solve need to reach the f32 tolerance
   floor (3e-6 relative residual)?
2. Does a linear-extrapolation predictor ``mu_guess = 2 mu_n - mu_{n-1}``
   beat the plain warm start?
3. How do V-cycle variants (smoother damping, P-smoothing depth) change
   the count?

Method: run the production chunked solver on the bench workload (CPU) until
vortex dynamics are live, capture a few consecutive (state, rhs) systems by
replaying single steps, then measure residuals after k solver iterations for
each variant. Prints one JSON line per (variant, k).

Usage: python tools/mu_study.py [--sites 25000] [--warm-steps 3000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=25_000)
    ap.add_argument("--warm-steps", type=int, default=3000)
    ap.add_argument("--n-states", type=int, default=4)
    ap.add_argument("--spread", type=int, default=0,
                    help="advance this many steps between captured states"
                         " (0 = consecutive states)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import tdgl_tpu as tdgl
    from tdgl_tpu.geometry import box
    from tdgl_tpu.models import gtdgl_stencil as gs
    from tdgl_tpu.ops.cg import cg_solve_fixed, mg_richardson_grid
    from tdgl_tpu.ops.hexmg import build_hexmg, make_hexmg_apply
    from tdgl_tpu.solver.solver import TDGLSolver

    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2.0,
                       thickness=0.1, conductivity=10.0)
    side = float(np.sqrt(args.sites * 0.238))
    film = tdgl.Polygon("film", points=box(side)).resample(
        max(200, int(11 * side)))
    device = tdgl.Device("bench", layer=layer, film=film, length_units="um")
    device.make_mesh(min_points=args.sites, max_edge_length=0.75,
                     structured=True)
    chunk = 500
    options = tdgl.SolverOptions(
        solve_time=1e9, dt_init=1e-4, dt_max=1e-2, save_every=chunk,
        steps_per_chunk=chunk, field_units="mT", current_units="uA",
        dtype="float32",
    )
    solver = TDGLSolver(device, options, applied_vector_potential=0.5)
    state = solver._initial_state()
    t0 = time.perf_counter()
    n_chunks = max(1, args.warm_steps // chunk)
    for _ in range(n_chunks):
        state, outputs, _ = solver.chunk_fn(state)
    jax.block_until_ready(state.mu)
    print(f"# warmed {n_chunks * chunk} steps in "
          f"{time.perf_counter() - t0:.1f}s; dt={float(state.prev_dt):.2e}",
          file=sys.stderr)

    sten = solver.sten
    cfg = solver.cfg
    rdtype = jnp.float32

    # Capture Poisson systems along the trajectory. The state carries
    # mu_prev, so the predictor guess needs no host-side history; between
    # captures the jitted chunk advances the dynamics.
    step_fn_systems = []
    U = gs.edge_link_phases(sten, state.A_applied)
    st = state
    from tdgl_tpu.solver.grid_step import make_grid_step_fn

    step_fn = make_grid_step_fn(cfg)
    for i in range(args.n_states):
        if args.spread:
            for _ in range(max(1, args.spread // chunk)):
                st, _, _ = solver.chunk_fn(st)
        else:
            st, _ = step_fn(sten, solver._screening_weights, solver.amg,
                            st, None)
        old_sq = st.psi_r**2 + st.psi_i**2
        res = gs.implicit_euler_psi(
            sten, U, st.psi_r, st.psi_i, old_sq, st.mu, st.epsilon,
            cfg.gamma, cfg.u, st.tentative_dt)
        J_s = gs.supercurrent_on_edges(sten, U, res.psi_r, res.psi_i)
        rhs = gs.poisson_rhs(sten, J_s, st.dA_dt, st.neumann_term)
        step_fn_systems.append((rhs, st.mu, st.mu_prev))

    valid = sten.valid.astype(rdtype)
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)

    def project(v):
        return (v - jnp.sum(v * valid) / n_valid) * valid

    def apply_A(x):
        return -gs.scalar_laplacian_sym(sten, x)

    def rel_res(x, b):
        r = b - apply_A(x)
        return float(jnp.sqrt(jnp.sum(r * r) / jnp.maximum(
            jnp.sum(b * b), 1e-30)))

    variants = {
        "mgr": dict(omega=0.9),
        "mgr_om0.8": dict(omega=0.8),
        "mgr_om1.0": dict(omega=1.0),
    }

    rows = []
    for name, v in variants.items():
        for predictor in (False, True):
            for k in (1, 2, 3, 4):
                worst = 0.0
                init = 0.0
                for rhs, mu_n, mu_nm1 in step_fn_systems:
                    guess = (2.0 * mu_n - mu_nm1) if predictor else mu_n
                    b = project(-(sten.area.astype(rdtype) * rhs))
                    init = max(init, rel_res(project(guess), b))
                    out = mg_richardson_grid(
                        sten, rhs, guess, solver.amg, amg_omega=v["omega"],
                        fixed_iters=k)
                    worst = max(worst, float(out.residual_norm))
                rows.append(dict(variant=name, predictor=predictor, k=k,
                                 worst_res=worst, init_res=init))
                print(json.dumps(rows[-1]), flush=True)

    # MG-preconditioned CG for comparison.
    apply_mg = make_hexmg_apply(0.9)
    for predictor in (False, True):
        for k in (1, 2, 3):
            worst = 0.0
            for rhs, mu_n, mu_nm1 in step_fn_systems:
                guess = (2.0 * mu_n - mu_nm1) if predictor else mu_n
                b = project(-(sten.area.astype(rdtype) * rhs))
                out = cg_solve_fixed(
                    apply_A, b, guess, k,
                    precond=lambda r: apply_mg(solver.amg, r),
                    project_fn=project)
                worst = max(worst, float(out.residual_norm))
            print(json.dumps(dict(variant="cg_mg", predictor=predictor,
                                  k=k, worst_res=worst)), flush=True)


if __name__ == "__main__":
    main()
