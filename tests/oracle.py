"""Pure NumPy/SciPy golden-trajectory oracle for the TDGL step.

Implements one reference time step exactly as the reference does it
(``/root/reference/tdgl/solver/solver.py:383-520``): a sparse covariant-
Laplacian matvec plus the closed-form quadratic for ``|psi^{n+1}|^2`` (in
the textbook discriminant form the reference uses), the supercurrent, the
divergence right-hand side, a cached sparse-LU solve for the scalar
potential (``tdgl/finite_volume/operators.py:296-308``), and the normal
current. The reference package itself cannot run in this environment
(numba/shapely/meshpy/pint are absent), so this module is the executable
stand-in used by ``tests/test_parity.py`` to check the jitted step against
the BASELINE.md trajectory-parity row (psi L2 <= 1e-6).

Gauge note: the pure-Neumann mu-Poisson solution is defined only up to an
additive constant (only potential differences are physical; the constant
enters psi as an unobservable global phase). The LU solution is therefore
mean-subtracted, pinning the same gauge the device solver's constant-mode
deflation pins, so psi trajectories compare without a phase ambiguity.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tdgl_tpu.fv.operators import (
    FVOperators,
    divergence_matrix,
    laplacian_matrix,
)


def _gradient_matrix(op: FVOperators, link_phases: np.ndarray):
    """Sparse covariant gradient (sites -> edges):
    ``(G psi)_e = (u_e psi_j - psi_i) / len_e`` (reference
    ``operators.py:87-117``)."""
    n_edges = len(op.edges)
    e0, e1 = op.edges[:, 0], op.edges[:, 1]
    rows = np.concatenate([np.arange(n_edges), np.arange(n_edges)])
    cols = np.concatenate([e1, e0])
    inv_len = 1.0 / op.edge_lengths
    vals = np.concatenate([link_phases * inv_len, -inv_len.astype(complex)])
    return sp.csr_array((vals, (rows, cols)),
                        shape=(n_edges, len(op.areas)))


def _mu_laplacian_matrix(op: FVOperators):
    """Sparse scalar-potential Laplacian ``L = diag(1/a) S`` with homogeneous
    Neumann BCs (reference ``operators.py:286`` via ``build_laplacian``)."""
    n = len(op.areas)
    e0, e1 = op.edges[:, 0], op.edges[:, 1]
    w = op.dual_edge_lengths / op.edge_lengths
    rows = np.concatenate([e0, e1, e0, e1])
    cols = np.concatenate([e1, e0, e0, e1])
    vals = np.concatenate([
        w / op.areas[e0],
        w / op.areas[e1],
        -w / op.areas[e0],
        -w / op.areas[e1],
    ])
    return sp.csc_array((vals, (rows, cols)), shape=(n, n))


class ReferenceOracle:
    """One reference-semantics TDGL step on host NumPy/SciPy.

    Args:
        op: The finite-volume operator tables (float64 recommended).
        gamma, u: gTDGL material parameters.
        A_edge: ``(E, 2)`` applied vector potential at edge centers, already
            nondimensionalized (the solver's ``A_scale`` applied).
        epsilon: ``(N,)`` disorder parameter (default 1).
        mu_boundary: ``(B,)`` boundary current densities (default 0).
        fix_psi: Apply Dirichlet identity rows at ``op.fixed_sites``.
    """

    def __init__(
        self,
        op: FVOperators,
        gamma: float,
        u: float,
        A_edge: Optional[np.ndarray] = None,
        epsilon: Optional[np.ndarray] = None,
        mu_boundary: Optional[np.ndarray] = None,
        fix_psi: bool = True,
    ):
        self.op = op
        self.gamma = float(gamma)
        self.u = float(u)
        n_sites = len(op.areas)
        n_edges = len(op.edges)
        n_boundary = len(op.boundary_edge_indices)
        if A_edge is None:
            A_edge = np.zeros((n_edges, 2))
        a_dot_e = np.einsum("ij,ij->i", np.asarray(A_edge, float),
                            op.edge_directions)
        self.link = np.exp(-1j * a_dot_e)
        self.psi_laplacian = laplacian_matrix(
            op, link_phases=self.link, fix_psi=fix_psi
        ).tocsr()
        self.psi_gradient = _gradient_matrix(op, self.link)
        self.mu_gradient = _gradient_matrix(
            op, np.ones(n_edges, dtype=complex)
        ).real
        self.divergence = divergence_matrix(op)
        # Cached LU factorization of the fixed mu-Laplacian, as the
        # reference does (``operators.py:296-308``). The operator is
        # singular (constant null space); SuperLU factors it regardless and
        # the arbitrary constant is pinned by mean subtraction below.
        self.mu_laplacian_lu = spla.factorized(_mu_laplacian_matrix(op))
        self.neumann = sp.csr_array(
            (op.nbl_vals, (op.nbl_rows, op.nbl_cols)),
            shape=(n_sites, n_boundary),
        )
        self.epsilon = (np.ones(n_sites) if epsilon is None
                        else np.asarray(epsilon, float))
        self.mu_boundary = (np.zeros(n_boundary) if mu_boundary is None
                            else np.asarray(mu_boundary, float))

    def solve_for_psi_squared(
        self, psi: np.ndarray, abs_sq_psi: np.ndarray, mu: np.ndarray,
        dt: float,
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """The closed-form implicit-Euler update for psi
        (``solver.py:383-439``); None if the discriminant goes negative."""
        gamma, u = self.gamma, self.u
        U = np.exp(-1j * mu * dt)
        z = U * gamma**2 / 2 * psi
        w = z * abs_sq_psi + U * (
            psi
            + (dt / u)
            * np.sqrt(1 + gamma**2 * abs_sq_psi)
            * ((self.epsilon - abs_sq_psi) * psi + self.psi_laplacian @ psi)
        )
        c = w.real * z.real + w.imag * z.imag
        two_c_1 = 2 * c + 1
        w2 = np.absolute(w) ** 2
        discriminant = two_c_1**2 - 4 * np.absolute(z) ** 2 * w2
        if np.any(discriminant < 0):
            return None
        new_sq_psi = (2 * w2) / (two_c_1 + np.sqrt(discriminant))
        return w - z * new_sq_psi, new_sq_psi

    def step(
        self, psi: np.ndarray, mu: np.ndarray, dt: float,
        dA_dt: float | np.ndarray = 0.0,
    ):
        """One full step: psi update, supercurrent, LU mu solve, currents.

        Returns ``(psi, mu, supercurrent, normal_current)``.
        """
        abs_sq_psi = np.absolute(psi) ** 2
        result = self.solve_for_psi_squared(psi, abs_sq_psi, mu, dt)
        if result is None:
            raise RuntimeError(f"negative discriminant at dt={dt}")
        psi, _ = result
        supercurrent = (
            psi.conjugate()[self.op.edges[:, 0]] * (self.psi_gradient @ psi)
        ).imag
        rhs = self.divergence @ (supercurrent - dA_dt) - (
            self.neumann @ self.mu_boundary
        )
        mu = self.mu_laplacian_lu(rhs)
        mu = mu - mu.mean()
        normal_current = -(self.mu_gradient @ mu) - dA_dt
        return psi, mu, supercurrent, normal_current
