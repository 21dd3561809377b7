"""On-TPU bit-parity probe for the roll-symmetry bandwidth levers.

The round-4 bandwidth levers rest on exact-math claims that were
CPU-parity-tested but (until this probe) only *argued* for XLA:TPU,
whose fusion could in principle reorder the float products:

1. ``scalar_laplacian_sym``: the negative-edge term derived as
   ``shift_m(w[k] * x, k)`` equals the two-sided form
   ``shift_m(w[k], k) * shift_m(x, k)`` bit-exactly (the same float
   products, evaluated pre- vs post-roll).
2. ``covariant_laplacian``: the rolled-product negative-edge link terms
   equal the read-the-rolled-planes-then-multiply form bit-exactly.
3. Factored link phases: on REAL edges, the reconstruction from the 4
   trig vectors is as accurate against the float64 angle evaluation as
   the direct f32 cos/sin planes are (NOT claimed bit-exact — angle
   addition reassociates the phase sum; at large angles both forms
   carry the angle's f32 rounding, ~|a| ulp radians).

Run (one TPU process at a time):
    python tools/roll_parity_probe.py [--sites 50000]

Prints one JSON line per claim with the max ulp distance measured ON
DEVICE (compare + reduce inside one jit program; only scalars are
fetched — the tunnel cannot fetch bool buffers).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_device  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sites", type=int, default=50_000)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the environment's"
                         " sitecustomize registers the TPU tunnel even"
                         " under JAX_PLATFORMS=cpu; this flag is the"
                         " reliable in-process override)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import tdgl_tpu as tdgl
    from tdgl_tpu.models import gtdgl_stencil as gs
    from tdgl_tpu.solver.solver import TDGLSolver
    from tdgl_tpu.utils.jaxio import to_numpy

    device = build_device(args.sites)
    options = tdgl.SolverOptions(
        solve_time=1e9, dt_init=1e-4, dt_max=1e-2, save_every=1000,
        steps_per_chunk=1000, field_units="mT", current_units="uA",
        dtype="float32",
    )
    solver = TDGLSolver(device, options, applied_vector_potential=0.5)
    sten = solver.sten
    rng = np.random.default_rng(11)
    shape = solver.maps.shape
    print(f"# backend={jax.default_backend()} grid={shape}",
          file=sys.stderr)

    def ulp_dist(a, b):
        # Bit distance between f32 arrays via int32 views (monotone
        # total-order trick); 0 == bitwise identical.
        ai = jax.lax.bitcast_convert_type(a, jnp.int32)
        bi = jax.lax.bitcast_convert_type(b, jnp.int32)
        ai = jnp.where(ai < 0, jnp.int32(-2147483648) - ai, ai)
        bi = jnp.where(bi < 0, jnp.int32(-2147483648) - bi, bi)
        return jnp.max(jnp.abs(ai - bi)).astype(jnp.float32)

    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    pr = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    pi = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    @jax.jit
    def probe_scalar(x):
        dt = x.dtype
        acc = jnp.zeros_like(x)
        for k in range(3):
            wk = sten.w[k].astype(dt)
            acc = acc + wk * gs.shift_p(x, k)
            # Two-sided: roll the plane AND the field, then multiply.
            acc = acc + gs.shift_m(wk, k) * gs.shift_m(x, k)
        ref = acc - x * sten.sym_diag.astype(dt)
        return ulp_dist(gs.scalar_laplacian_sym(sten, x), ref)

    print(json.dumps({
        "claim": "scalar_laplacian_sym rolled-products == two-sided",
        "max_ulp": float(to_numpy(probe_scalar(x))),
    }), flush=True)

    # Link planes from a random (bounded) phase field, weight-folded as
    # in the f32 production path.
    A_rand = jnp.asarray(
        (0.3 * rng.standard_normal((3,) + shape + (2,)))
        .astype(np.float32))
    U = gs.edge_link_phases(sten, A_rand)
    Uf = gs.fold_link_phases(sten, U)

    @jax.jit
    def probe_cov(pr, pi):
        dt = pr.dtype
        # Shipped accumulation (rolled products — covariant_laplacian's
        # inner loop, folded branch).
        br = jnp.zeros_like(pr)
        bi = jnp.zeros_like(pi)
        # Two-sided accumulation (read rolled planes, then multiply).
        ar = jnp.zeros_like(pr)
        ai = jnp.zeros_like(pi)
        for k in range(3):
            pr_p = gs.shift_p(pr, k)
            pi_p = gs.shift_p(pi, k)
            wur = Uf.wur[k].astype(dt)
            wui = Uf.wui[k].astype(dt)
            pos_r = wur * pr_p - wui * pi_p
            pos_i = wur * pi_p + wui * pr_p
            br = br + pos_r
            bi = bi + pos_i
            ar = ar + pos_r
            ai = ai + pos_i
            br = br + gs.shift_m(wur * pr + wui * pi, k)
            bi = bi + gs.shift_m(wur * pi - wui * pr, k)
            wur_m = gs.shift_m(wur, k)
            wui_m = gs.shift_m(wui, k)
            pr_m = gs.shift_m(pr, k)
            pi_m = gs.shift_m(pi, k)
            ar = ar + (wur_m * pr_m + wui_m * pi_m)
            ai = ai + (wur_m * pi_m - wui_m * pr_m)
        return ulp_dist(br, ar), ulp_dist(bi, ai)

    dr, di = probe_cov(pr, pi)
    print(json.dumps({
        "claim": "covariant accumulation rolled-products == two-sided",
        "max_ulp_re": float(to_numpy(dr)),
        "max_ulp_im": float(to_numpy(di)),
    }), flush=True)

    # Factored link phases: the PRODUCTION separable potential — the
    # solver's own ``state.A_applied`` (f32; the uniform bench field, for
    # which ``factor_link_phases`` auto-enabled after the f64 init-time
    # separability check). Probe subtleties:
    #   * Only REAL edges matter (edge_valid mask): padded grid positions
    #     carry arbitrary/degenerate coordinates whose phase angles make
    #     any comparison meaningless — and their link planes are never
    #     read (weights are zero there). In particular a synthetic
    #     potential built from ``sten.ec_x/ec_y`` is NOT separable across
    #     the padding (residual ~0.09 in f64!) — only the production
    #     lattice-extended potential is.
    #   * ulp distance is the wrong metric (near a cos/sin zero a ~1e-7
    #     ABSOLUTE error spans astronomically many ulps of the tiny
    #     result), and "vs direct f32 cos/sin" is the wrong referee: at
    #     angle magnitude |a| both f32 forms carry ~|a| ulp of angle
    #     rounding (here |ang| ~ 14, |f|+|g| ~ 68 rad). So judge BOTH
    #     f32 forms against the float64 angle evaluation, computed on
    #     the host, masked to real edges.
    assert solver.cfg.factor_link_phases, "bench field must auto-enable"
    state = solver._initial_state()
    Aap64 = np.asarray(to_numpy(state.A_applied), np.float64)
    dirs64 = np.asarray(to_numpy(sten.edge_dirs), np.float64)
    ang64 = (Aap64[..., 0] * dirs64[:, 0, None, None]
             + Aap64[..., 1] * dirs64[:, 1, None, None])
    want_r64 = np.cos(ang64)
    want_i64 = -np.sin(ang64)
    ev = (np.asarray(solver.host_sten.edge_valid) > 0)

    A_sep = jnp.asarray(Aap64.astype(np.float32))
    F = gs.factor_link_phases(sten, A_sep)
    want_r = jnp.asarray(want_r64.astype(np.float32))
    want_i = jnp.asarray(want_i64.astype(np.float32))
    mask = jnp.asarray(ev.astype(np.float32))

    @jax.jit
    def probe_factor(A_sep, want_r, want_i, mask):
        ang = gs.edge_phase_angles(sten, A_sep)
        err_fact = jnp.float32(0)
        err_direct = jnp.float32(0)
        err_cross = jnp.float32(0)
        for k in range(3):
            ur, ui = gs._factored_u_k(F, k, jnp.float32)
            dr, di = jnp.cos(ang[k]), -jnp.sin(ang[k])
            for got, direct, want in ((ur, dr, want_r[k]),
                                      (ui, di, want_i[k])):
                m = mask[k]
                err_fact = jnp.maximum(
                    err_fact, jnp.max(m * jnp.abs(got - want)))
                err_direct = jnp.maximum(
                    err_direct, jnp.max(m * jnp.abs(direct - want)))
                err_cross = jnp.maximum(
                    err_cross, jnp.max(m * jnp.abs(got - direct)))
        return err_fact, err_direct, err_cross

    ef, ed, ec = probe_factor(A_sep, want_r, want_i, mask)
    print(json.dumps({
        "claim": "factored link phases, real edges, f64 referee",
        "max_abs_err_factored_vs_f64": float(to_numpy(ef)),
        "max_abs_err_direct_f32_vs_f64": float(to_numpy(ed)),
        "max_abs_err_factored_vs_direct": float(to_numpy(ec)),
    }), flush=True)


if __name__ == "__main__":
    main()
