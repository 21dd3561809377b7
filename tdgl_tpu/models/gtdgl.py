"""The generalized TDGL equations as pure, jit-able JAX functions.

This is the physics layer: every function here is a pure array -> array map
with static shapes, suitable for fusion inside a single compiled step. The
discrete equations follow the reference's finite-volume formulation
(``/root/reference/docs/background.rst:241-357`` and
``tdgl/solver/solver.py:383-520``); the implementation is gather-based (ELL
neighbor tables from :mod:`tdgl_tpu.fv.operators`) instead of SciPy sparse
matvecs.

Conventions:

* ``psi`` is complex on sites, ``mu`` real on sites.
* Edge quantities (supercurrent, normal current, A) live on the canonical
  edge orientation ``r[edges[:,1]] - r[edges[:,0]]``.
* ``U_e = exp(-i A.e_direction)`` is the spatial link variable; the directed
  phase from site i to neighbor j is ``U_e`` if the edge's canonical
  direction points i -> j, else ``conj(U_e)``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _gather_complex(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather a complex array through integer indices, split-complex.

    The TPU runtime in this environment reproducibly faults on large
    complex-dtype gathers (the round-2 ~50k-site ELL fence) while the same
    gather over float32 data is fine at 100k+ sites
    (``tools/ell_fault_probe.py``). Stack re/im into a trailing axis of a
    real array, gather once, and recombine — bit-exact equal to ``x[idx]``.
    """
    if not jnp.iscomplexobj(x):
        return x[idx]
    s = jnp.stack([x.real, x.imag], axis=-1)[idx]
    return jax.lax.complex(s[..., 0], s[..., 1])


def edge_link_phases(A_edge: jax.Array, edge_directions: jax.Array) -> jax.Array:
    """Link variables ``U_e = exp(-i A(r_e) . e)`` for each edge.

    Args:
        A_edge: ``(E, 2)`` vector potential at edge centers.
        edge_directions: ``(E, 2)`` unnormalized edge vectors.
    """
    a = jnp.sum(A_edge * edge_directions, axis=1)
    return jax.lax.complex(jnp.cos(a), -jnp.sin(a))


def covariant_laplacian(op, U: jax.Array, psi: jax.Array) -> jax.Array:
    """Covariant Laplacian ``(nabla - iA)^2 psi`` on sites.

    ``(L psi)_i = (1/a_i) sum_j (w_ij) (U_ij psi_j - psi_i)`` with
    ``w_ij = dual_len/edge_len`` (``background.rst: laplacian-psi``).
    Rows for fixed (terminal) sites become identity rows, matching the
    reference's Dirichlet handling (``operators.py:170-181``).
    """
    U_slot = _gather_complex(U, op.nbr_edge)
    U_dir = jnp.where(op.nbr_sign > 0, U_slot, U_slot.conj())
    psi_nbr = _gather_complex(psi, op.nbr_site)
    w = op.w_lap.astype(psi.real.dtype)
    lap = (jnp.sum(w * (U_dir * psi_nbr), axis=1)
           - psi * op.w_lap_rowsum.astype(psi.real.dtype))
    fixed = op.fixed_mask.astype(psi.real.dtype)
    return (1.0 - fixed) * lap + fixed * psi


def scalar_laplacian_sym(op, x: jax.Array) -> jax.Array:
    """Symmetric (area-unscaled) Neumann Laplacian ``(S x)_i = sum_j w_ij (x_j - x_i)``.

    The mu-Poisson operator is ``L = diag(1/a) S``; CG solves with the
    symmetric ``S`` directly.
    """
    w = op.w_sym.astype(x.dtype)
    return (jnp.sum(w * x[op.nbr_site], axis=1)
            - x * op.w_sym_rowsum.astype(x.dtype))


def gradient_on_edges(op, x: jax.Array) -> jax.Array:
    """Discrete gradient of a site scalar, on edges: ``(x_j - x_i)/e_ij``."""
    e0 = op.edges[:, 0]
    e1 = op.edges[:, 1]
    return (x[e1] - x[e0]) / op.edge_lengths.astype(x.dtype)


def supercurrent_on_edges(op, U: jax.Array, psi: jax.Array) -> jax.Array:
    """Gauge-invariant supercurrent ``J_s = Im[psi_i^* (U psi_j - psi_i)]/e``
    on edges (reference ``operators.py:385-394``)."""
    e0 = op.edges[:, 0]
    e1 = op.edges[:, 1]
    psi0 = _gather_complex(psi, e0)
    psi1 = _gather_complex(psi, e1)
    grad = (U * psi1 - psi0) / op.edge_lengths.astype(psi.real.dtype)
    return (psi0.conj() * grad).imag


def divergence_on_sites(op, F_edge: jax.Array) -> jax.Array:
    """Divergence of an edge flux onto sites:
    ``(div F)_i = (1/a_i) sum_j F_ij s_ij`` (``background.rst: divergence``)."""
    w = op.w_div.astype(F_edge.dtype)
    return jnp.sum(w * F_edge[op.nbr_edge], axis=1)


def neumann_boundary_term(op, mu_boundary: jax.Array, n_sites: int) -> jax.Array:
    """Inhomogeneous Neumann BC contribution to the mu-Poisson RHS:
    scatter ``len_b/(2 a_i) * J_ext_b`` onto the boundary sites
    (reference ``operators.py:188-230``)."""
    vals = op.nbl_vals.astype(mu_boundary.dtype) * mu_boundary[op.nbl_cols]
    return jnp.zeros(n_sites, dtype=mu_boundary.dtype).at[op.nbl_rows].add(vals)


def edge_quantity_to_sites(op, F_edge: jax.Array, n_sites: int) -> jax.Array:
    """Average an edge flux onto site vectors, in the reference's K0-unit
    convention (``mesh.py:203-243``): site value = (1/2) mean over incident
    edges of ``F_e e_hat`` — which converts edge values in J0/4 units to site
    vectors in K0 units."""
    dirs = (op.edge_directions
            / jnp.linalg.norm(op.edge_directions, axis=1, keepdims=True)
            ).astype(F_edge.dtype)
    flux = F_edge[:, None] * dirs
    e0, e1 = op.edges[:, 0], op.edges[:, 1]
    sums = (
        jnp.zeros((n_sites, 2), dtype=F_edge.dtype)
        .at[e0].add(flux)
        .at[e1].add(flux)
    )
    counts = (
        jnp.zeros(n_sites, dtype=F_edge.dtype)
        .at[e0].add(1.0)
        .at[e1].add(1.0)
    )
    return sums / (2.0 * jnp.maximum(counts, 1.0))[:, None]


class PsiUpdateResult(NamedTuple):
    psi: jax.Array
    abs_sq_psi: jax.Array
    ok: jax.Array  # scalar bool: discriminant nonnegative everywhere


def implicit_euler_psi(
    op,
    U: jax.Array,
    psi: jax.Array,
    abs_sq_psi: jax.Array,
    mu: jax.Array,
    epsilon: jax.Array,
    gamma: float,
    u: float,
    dt: jax.Array,
) -> PsiUpdateResult:
    """One implicit-Euler update of the order parameter.

    Solves the closed-form quadratic for ``|psi^{n+1}|^2``
    (``background.rst: quad-root``):

    ``|psi^{n+1}|^2 = 2|w|^2 / (2c+1 + sqrt((2c+1)^2 - 4|z|^2|w|^2))``

    with ``z = exp(-i mu dt) (gamma^2/2) psi`` and
    ``w = z|psi|^2 + exp(-i mu dt)[psi + (dt/u) sqrt(1+gamma^2|psi|^2)
    ((eps - |psi|^2) psi + (nabla-iA)^2 psi)]``, then
    ``psi^{n+1} = w - z |psi^{n+1}|^2``.

    ``ok`` is False if the discriminant is negative anywhere (time step too
    large; caller retries with smaller dt).
    """
    # NOTE: dt stays a (possibly weak-typed) scalar; eager jnp.asarray of a
    # python float would create a 0-d device constant, which some backends
    # cannot fetch during lowering.
    phase = mu * dt
    U_t = jax.lax.complex(jnp.cos(phase), -jnp.sin(phase))
    z = U_t * (0.5 * gamma**2) * psi
    lap = covariant_laplacian(op, U, psi)
    w = z * abs_sq_psi + U_t * (
        psi
        + (dt / u)
        * jnp.sqrt(1.0 + gamma**2 * abs_sq_psi)
        * ((epsilon - abs_sq_psi) * psi + lap)
    )
    c = w.real * z.real + w.imag * z.imag
    two_c_1 = 2.0 * c + 1.0
    w2 = jnp.abs(w) ** 2
    # The textbook discriminant (2c+1)^2 - 4|z|^2|w|^2 suffers catastrophic
    # cancellation in float32 (both terms are O(gamma^4)). Using
    # c^2 - |z|^2|w|^2 = Re(conj(w) z)^2 - |conj(w) z|^2 = -Im(conj(w) z)^2,
    # it equals 1 + 4c - 4 Im(conj(w) z)^2 exactly — no large squares.
    im_wz = w.real * z.imag - w.imag * z.real
    discriminant = 1.0 + 4.0 * c - 4.0 * im_wz**2
    ok = jnp.all(discriminant >= 0.0)
    sqrt_disc = jnp.sqrt(jnp.maximum(discriminant, 0.0))
    new_sq = (2.0 * w2) / (two_c_1 + sqrt_disc)
    new_psi = w - z * new_sq
    return PsiUpdateResult(new_psi, new_sq, ok)


def poisson_rhs(
    op,
    supercurrent: jax.Array,
    dA_dt: jax.Array,
    mu_boundary: jax.Array,
) -> jax.Array:
    """RHS of the mu-Poisson equation:
    ``div(J_s - dA/dt) - N_bl @ mu_boundary`` (reference ``solver.py:508``)."""
    n = op.areas.shape[0]
    return divergence_on_sites(op, supercurrent - dA_dt) - neumann_boundary_term(
        op, mu_boundary, n
    )
