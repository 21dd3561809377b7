"""Fused Pallas kernels for the structured TDGL step body.

Motivation (measured, docs/perf_notes.md): every component of the stencil
step already runs at the XLA HBM roofline *per operation* — the remaining
waste is that the step body re-reads the same planes many times across the
psi-update roll chain, the supercurrent, and the Poisson-RHS divergence
(~43 us of body vs ~17 us of unique bytes). These kernels compute each
phase in ONE pass over VMEM-resident blocks, so every input plane is read
from HBM exactly once and every roll is a VMEM-local shuffle.

The whole benchmark grid — (256, 384) f32, ~0.4 MB/plane — fits in VMEM as
a single block, so no tiling/halo machinery is needed: ``pallas_call`` with
full-array BlockSpecs and in-kernel ``jnp.roll`` (lowered by Mosaic to
lane/sublane shifts). Physics is identical to
:mod:`tdgl_tpu.models.gtdgl_stencil` (same update; see that module for the
reference call-outs); parity is pinned by ``tests/test_pallas_step.py``.

Wrap-around reads at grid edges are killed by zero weights at masked and
padded entries, exactly as in the roll-based formulation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..device.hexmesh import EDGE_OFFSETS

_OFFS = tuple(EDGE_OFFSETS)


def _roll(x, dr: int, dc: int):
    """VMEM-local circular shift by (dr, dc) on the last two axes."""
    if dr:
        x = jnp.roll(x, dr, axis=-2)
    if dc:
        x = jnp.roll(x, dc, axis=-1)
    return x


def _shift_p(x, k: int):
    dr, dc = _OFFS[k]
    return _roll(x, -dr, -dc)


def _shift_m(x, k: int):
    dr, dc = _OFFS[k]
    return _roll(x, dr, dc)


def _interpret() -> bool:
    # Interpret mode off-TPU so the fused path is testable (and correct)
    # on the CPU conftest mesh; compiled Mosaic on real TPUs.
    return jax.default_backend() != "tpu"


def _psi_kernel(gamma: float, u: float,
                pr_ref, pi_ref, mu_ref, eps_ref,
                ur_ref, ui_ref, urm_ref, uim_ref,
                w_ref, wm_ref, diag_ref, inv_area_ref, fixed_ref, valid_ref,
                dt_ref,
                out_r_ref, out_i_ref, out_sq_ref, min_disc_ref):
    """Fused covariant Laplacian + implicit-Euler psi update.

    Mirrors :func:`gtdgl_stencil.implicit_euler_psi` +
    :func:`gtdgl_stencil.covariant_laplacian` term for term.
    """
    pr = pr_ref[:]
    pi = pi_ref[:]
    dt = dt_ref[0]
    old_sq = pr * pr + pi * pi

    # Covariant Laplacian, one pass over the six incident edges.
    acc_r = jnp.zeros_like(pr)
    acc_i = jnp.zeros_like(pi)
    for k in range(3):
        wk = w_ref[k]
        ur = ur_ref[k]
        ui = ui_ref[k]
        pr_p = _shift_p(pr, k)
        pi_p = _shift_p(pi, k)
        acc_r = acc_r + wk * (ur * pr_p - ui * pi_p)
        acc_i = acc_i + wk * (ur * pi_p + ui * pr_p)
        wm = wm_ref[k]
        urm = urm_ref[k]
        uim = uim_ref[k]
        pr_m = _shift_m(pr, k)
        pi_m = _shift_m(pi, k)
        acc_r = acc_r + wm * (urm * pr_m + uim * pi_m)
        acc_i = acc_i + wm * (urm * pi_m - uim * pr_m)
    inv_a = inv_area_ref[:]
    lap_r = (acc_r - pr * diag_ref[:]) * inv_a
    lap_i = (acc_i - pi * diag_ref[:]) * inv_a
    fixed = fixed_ref[:]
    lap_r = (1.0 - fixed) * lap_r + fixed * pr
    lap_i = (1.0 - fixed) * lap_i + fixed * pi

    # Closed-form implicit-Euler quadratic (cancellation-free discriminant).
    mu = mu_ref[:]
    phase = mu * dt
    tr = jnp.cos(phase)
    ti = -jnp.sin(phase)
    half_g2 = 0.5 * gamma**2
    zr = half_g2 * (tr * pr - ti * pi)
    zi = half_g2 * (tr * pi + ti * pr)
    eps = eps_ref[:]
    coeff = (dt / u) * jnp.sqrt(1.0 + gamma**2 * old_sq)
    gr = pr + coeff * ((eps - old_sq) * pr + lap_r)
    gi = pi + coeff * ((eps - old_sq) * pi + lap_i)
    wr = zr * old_sq + tr * gr - ti * gi
    wi = zi * old_sq + tr * gi + ti * gr
    c = wr * zr + wi * zi
    two_c_1 = 2.0 * c + 1.0
    w2 = wr * wr + wi * wi
    im_wz = wr * zi - wi * zr
    discriminant = 1.0 + 4.0 * c - 4.0 * im_wz**2
    valid = valid_ref[:]
    min_disc_ref[0] = jnp.min(jnp.where(valid > 0, discriminant, 1.0))
    sqrt_disc = jnp.sqrt(jnp.maximum(discriminant, 0.0))
    new_sq = (2.0 * w2) / (two_c_1 + sqrt_disc)
    out_r_ref[:] = (wr - zr * new_sq) * valid
    out_i_ref[:] = (wi - zi * new_sq) * valid
    out_sq_ref[:] = new_sq * valid


@functools.partial(jax.jit, static_argnums=(0, 1))
def fused_psi_update(gamma: float, u: float, sten, U, pr, pi, mu,
                     epsilon, dt):
    """Pallas-fused equivalent of ``gs.implicit_euler_psi`` (old_sq is
    recomputed in-kernel). Returns ``(new_r, new_i, new_sq, ok)``."""
    rd = pr.dtype
    shape = pr.shape
    plane = jax.ShapeDtypeStruct(shape, rd)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_r, out_i, out_sq, min_disc = pl.pallas_call(
        functools.partial(_psi_kernel, float(gamma), float(u)),
        out_shape=(plane, plane, plane,
                   jax.ShapeDtypeStruct((1,), rd)),
        in_specs=[vspec] * 14 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(vspec, vspec, vspec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=_interpret(),
    )(
        pr, pi, mu, epsilon,
        U.ur.astype(rd), U.ui.astype(rd), U.urm.astype(rd),
        U.uim.astype(rd),
        sten.w.astype(rd), sten.w_m.astype(rd),
        sten.sym_diag.astype(rd), sten.inv_area.astype(rd),
        sten.fixed_mask.astype(rd), sten.valid.astype(rd),
        jnp.reshape(jnp.asarray(dt, rd), (1,)),
    )
    return out_r, out_i, out_sq, min_disc[0] >= 0.0


def _rhs_kernel(pr_ref, pi_ref,
                ur_ref, ui_ref, inv_len_ref, dual_ref,
                dA_dt_ref, inv_area_ref, neumann_ref,
                rhs_ref):
    """Fused supercurrent + divergence + Neumann RHS.

    Mirrors ``gs.supercurrent_on_edges`` -> ``gs.poisson_rhs`` without
    materializing the (3, Rp, Cp) edge currents in HBM.
    """
    pr = pr_ref[:]
    pi = pi_ref[:]
    acc = jnp.zeros_like(pr)
    for k in range(3):
        ur = ur_ref[k]
        ui = ui_ref[k]
        pr_p = _shift_p(pr, k)
        pi_p = _shift_p(pi, k)
        grad_r = ur * pr_p - ui * pi_p - pr
        grad_i = ur * pi_p + ui * pr_p - pi
        J_k = (pr * grad_i - pi * grad_r) * inv_len_ref[k]
        dF = dual_ref[k] * (J_k - dA_dt_ref[k])
        acc = acc + dF - _shift_m(dF, k)
    rhs_ref[:] = acc * inv_area_ref[:] - neumann_ref[:]


@jax.jit
def fused_poisson_rhs(sten, U, pr, pi, dA_dt, neumann_term):
    """Pallas-fused equivalent of
    ``gs.poisson_rhs(sten, gs.supercurrent_on_edges(...), dA_dt, nbl)``."""
    rd = pr.dtype
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _rhs_kernel,
        out_shape=jax.ShapeDtypeStruct(pr.shape, rd),
        in_specs=[vspec] * 9,
        out_specs=vspec,
        interpret=_interpret(),
    )(
        pr, pi, U.ur.astype(rd), U.ui.astype(rd),
        sten.inv_len.astype(rd), sten.dual.astype(rd),
        dA_dt.astype(rd), sten.inv_area.astype(rd),
        neumann_term.astype(rd),
    )
