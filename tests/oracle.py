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
        self._fix_psi = bool(fix_psi)
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
        # singular (constant null space); SuperLU usually factors it
        # regardless and the arbitrary constant is pinned by mean
        # subtraction below. When pivoting does detect the exact
        # singularity, drop one redundant row (the system is rank n-1 with
        # a compatible rhs) and impose mu[0] = 0 instead — the same
        # solution up to the constant the mean subtraction removes.
        L = _mu_laplacian_matrix(op)
        try:
            self.mu_laplacian_lu = spla.factorized(L)
        except RuntimeError:
            Lp = L.tolil()
            Lp[0, :] = 0.0
            Lp[0, 0] = 1.0
            lu = spla.factorized(sp.csc_array(Lp.tocsc()))

            def pinned_solve(rhs, _lu=lu):
                rhs = np.array(rhs, dtype=float)
                rhs[0] = 0.0
                return _lu(rhs)

            self.mu_laplacian_lu = pinned_solve
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

    def set_link(self, A_edge: np.ndarray) -> None:
        """Rebuild the covariant operators for a new total vector potential
        (the reference's ``set_link_exponents``, ``operators.py:310-383``;
        used by the screening fixed point)."""
        a_dot_e = np.einsum("ij,ij->i", np.asarray(A_edge, float),
                            self.op.edge_directions)
        self.link = np.exp(-1j * a_dot_e)
        self.psi_laplacian = laplacian_matrix(
            self.op, link_phases=self.link, fix_psi=self._fix_psi
        ).tocsr()
        self.psi_gradient = _gradient_matrix(self.op, self.link)

    def observables(self, psi: np.ndarray, dA_dt=0.0):
        """Supercurrent, LU mu solve, normal current
        (``solver.py:489-520``)."""
        supercurrent = (
            psi.conjugate()[self.op.edges[:, 0]] * (self.psi_gradient @ psi)
        ).imag
        rhs = self.divergence @ (supercurrent - dA_dt) - (
            self.neumann @ self.mu_boundary
        )
        mu = self.mu_laplacian_lu(rhs)
        mu = mu - mu.mean()
        normal_current = -(self.mu_gradient @ mu) - dA_dt
        return mu, supercurrent, normal_current

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
        mu, supercurrent, normal_current = self.observables(psi, dA_dt)
        return psi, mu, supercurrent, normal_current


def edge_quantity_to_sites(op: FVOperators, F_edge: np.ndarray) -> np.ndarray:
    """NumPy twin of ``models.gtdgl.edge_quantity_to_sites`` (reference
    ``mesh.py:203-243``): site vector = (1/2) mean over incident edges of
    ``F_e e_hat``."""
    n_sites = len(op.areas)
    dirs = op.edge_directions / np.linalg.norm(
        op.edge_directions, axis=1, keepdims=True)
    flux = F_edge[:, None] * dirs
    sums = np.zeros((n_sites, 2))
    counts = np.zeros(n_sites)
    for col in (op.edges[:, 0], op.edges[:, 1]):
        np.add.at(sums, col, flux)
        np.add.at(counts, col, 1.0)
    return sums / (2.0 * np.maximum(counts, 1.0))[:, None]


class OracleRunner:
    """Reference-semantics time-stepping driver on top of
    :class:`ReferenceOracle`: the adaptive time step with discriminant
    retries and window-averaged dt selection (``solver.py:441-487,698-707``)
    and, optionally, the Polyak screening fixed point
    (``solver.py:522-578,654-688`` with the dense pairwise kernel of
    ``screening.py:12-42``).

    Args:
        oracle: The single-step physics oracle.
        dt_init / dt_max / adaptive / adaptive_window / max_solve_retries /
            multiplier: The reference's adaptive-stepping knobs.
        screening: Enable the self-consistent induced vector potential.
        screening_weights: ``(S,)`` per-site prefactor (the solver's
            ``A_scale * xi * area``).
        A_applied: ``(E, 2)`` applied vector potential (total potential =
            applied + induced inside the fixed point).
        edge_centers / sites: Dimensionless positions for the pairwise sum.
        alpha / beta: Polyak step size / drag.
    """

    def __init__(
        self,
        oracle: ReferenceOracle,
        dt_init: float,
        dt_max: float,
        adaptive: bool = True,
        adaptive_window: int = 10,
        max_solve_retries: int = 10,
        multiplier: float = 0.25,
        screening: bool = False,
        screening_weights: Optional[np.ndarray] = None,
        A_applied: Optional[np.ndarray] = None,
        edge_centers: Optional[np.ndarray] = None,
        sites: Optional[np.ndarray] = None,
        screening_tolerance: float = 1e-6,
        alpha: float = 0.1,
        beta: float = 0.5,
        max_iterations_per_step: int = 1000,
    ):
        self.oracle = oracle
        self.dt_init = float(dt_init)
        self.dt_max = float(dt_max)
        self.adaptive = adaptive
        self.window = int(adaptive_window)
        self.max_solve_retries = int(max_solve_retries)
        self.multiplier = float(multiplier)
        self.tentative_dt = float(dt_init)
        self.d_psi_sq_vals: list = []
        self.step_index = 0
        self.screening = screening
        self.screening_weights = screening_weights
        self.A_applied = A_applied
        self.edge_centers = edge_centers
        self.sites = sites
        self.screening_tolerance = float(screening_tolerance)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.max_iterations_per_step = int(max_iterations_per_step)

    def _adaptive_euler(self, psi, old_sq, mu, dt):
        result = self.oracle.solve_for_psi_squared(psi, old_sq, mu, dt)
        retries = 0
        while result is None:
            if not self.adaptive or retries > self.max_solve_retries:
                raise RuntimeError(
                    f"retries exhausted at step {self.step_index}"
                )
            dt = dt * self.multiplier
            result = self.oracle.solve_for_psi_squared(psi, old_sq, mu, dt)
            retries += 1
        self.last_retries = retries
        psi, new_sq = result
        return psi, new_sq, dt

    def _induced_A(self, J_edge: np.ndarray) -> np.ndarray:
        """Dense pairwise sum ``A[e] = sum_s Jw[s] / |r_e - r_s|``
        (``screening.py:34-42``)."""
        J_site = edge_quantity_to_sites(self.oracle.op, J_edge)
        Jw = J_site * self.screening_weights[:, None]
        dx = self.edge_centers[:, 0][:, None] - self.sites[:, 0][None, :]
        dy = self.edge_centers[:, 1][:, None] - self.sites[:, 1][None, :]
        inv_d = 1.0 / np.sqrt(dx * dx + dy * dy)
        return inv_d @ Jw

    def step(self, psi, mu, A_induced=None, dA_dt=0.0):
        """One reference update. Returns a dict with psi, mu, currents,
        dt (used), A_induced, and screening iteration count."""
        oracle = self.oracle
        old_sq = np.absolute(psi) ** 2
        dt = self.tentative_dt
        screening_error = np.inf
        velocity = 0.0
        iteration = 0
        for iteration in range(self.max_iterations_per_step + 2):
            if screening_error < self.screening_tolerance:
                break
            if iteration > self.max_iterations_per_step:
                raise RuntimeError(
                    f"screening did not converge (error {screening_error:.3e}"
                    f" after {iteration} iterations)"
                )
            if self.screening:
                oracle.set_link(self.A_applied + A_induced)
            psi_new, new_sq, dt = self._adaptive_euler(psi, old_sq, mu, dt)
            mu_new, J_s, J_n = oracle.observables(psi_new, dA_dt)
            psi, mu = psi_new, mu_new
            if not self.screening:
                break
            A_new = self._induced_A(J_s + J_n)
            dA = A_new - A_induced
            velocity = (1.0 - self.beta) * velocity + self.alpha * dA
            A_induced = A_induced + velocity
            screening_error = float(np.max(
                np.linalg.norm(dA, axis=1)
                / np.maximum(np.linalg.norm(A_induced, axis=1), 1e-20)
            ))

        if self.adaptive:
            self.d_psi_sq_vals.append(float(np.abs(new_sq - old_sq).max()))
            if self.step_index > self.window:
                new_dt = self.dt_init / max(
                    1e-10, np.mean(self.d_psi_sq_vals[-self.window:])
                )
                self.tentative_dt = float(
                    np.clip(0.5 * (new_dt + dt), 0, self.dt_max)
                )
        self.step_index += 1
        return dict(psi=psi, mu=mu, supercurrent=J_s, normal_current=J_n,
                    dt=dt, A_induced=A_induced,
                    screening_iterations=iteration,
                    retries=getattr(self, "last_retries", 0))
