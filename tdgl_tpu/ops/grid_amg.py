"""Two-level aggregation multigrid for the stencil (hex-grid) backend.

Same mathematical construction as :mod:`tdgl_tpu.ops.amg` (piecewise-constant
aggregation, dense-pinv coarse solve on the MXU, damped-Jacobi smoothing) —
but the aggregates are ``block x block`` grid tiles, so restriction is a
reshape-sum and prolongation a broadcast: **no gathers anywhere** in the
V-cycle, unlike the cluster-id gathers of the unstructured version.

The coarse operator is still the exact Galerkin product ``P^T A P`` built on
the host from the mesh graph.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

# Aggregate tile size (rows x cols of the fine grid per coarse unknown).
# 8x8 = 64 sites per aggregate keeps the dense coarse solve ~1.5k unknowns
# at 50k sites.
BLOCK = (8, 8)


class GridAMGData(NamedTuple):
    """Device arrays of the grid two-level preconditioner (a pytree)."""

    Ac_inv: np.ndarray    # (nc, nc) dense pseudo-inverse of P^T A P
    inv_diag: np.ndarray  # (Rp, Cp) — valid/diag(A), 0 at masked sites


def build_grid_amg(mesh, sten, maps, dtype=np.float32) -> GridAMGData:
    """Build the block-aggregated hierarchy for ``A = -S``.

    Args:
        mesh: The structured :class:`Mesh` (for the edge graph).
        sten: :class:`StencilOperators` (host numpy arrays).
        maps: :class:`GridMaps`.
    """
    import scipy.sparse as sp

    Rp, Cp = maps.shape
    bR, bC = BLOCK
    assert Rp % bR == 0 and Cp % bC == 0
    nbR, nbC = Rp // bR, Cp // bC
    nc = nbR * nbC

    # Cluster of each site = its grid tile.
    rr = maps.site_flat // Cp
    cc = maps.site_flat % Cp
    cluster = (rr // bR) * nbC + (cc // bC)

    em = mesh.edge_mesh
    edges = np.asarray(em.edges, dtype=np.int64)
    wgt = np.asarray(em.dual_edge_lengths / em.edge_lengths,
                     dtype=np.float64)
    n = maps.n_sites
    e0, e1 = edges[:, 0], edges[:, 1]
    rows = np.concatenate([e0, e1, e0, e1])
    cols = np.concatenate([e1, e0, e0, e1])
    vals = np.concatenate([-wgt, -wgt, wgt, wgt])  # A = -S (PSD)
    A = sp.csr_array((vals, (rows, cols)), shape=(n, n))

    P = sp.csr_array(
        (np.ones(n), (np.arange(n), cluster)), shape=(n, nc)
    )
    Ac = np.asarray((P.T @ A @ P).todense())
    Ac_inv = np.linalg.pinv(Ac, rcond=1e-12)

    inv_diag = np.where(
        np.asarray(sten.valid) > 0,
        1.0 / np.maximum(np.asarray(sten.sym_diag), 1e-30),
        0.0,
    ).astype(dtype)
    return GridAMGData(Ac_inv=Ac_inv.astype(dtype), inv_diag=inv_diag)


def make_grid_amg_apply(amg_omega: float):
    """Returns the jax V-cycle apply ``(apply_A, amg, r) -> z`` on grids."""
    import jax.numpy as jnp

    bR, bC = BLOCK

    def apply_amg(apply_A, amg, r):
        rdtype = r.dtype
        Rp, Cp = r.shape
        nbR, nbC = Rp // bR, Cp // bC
        inv_diag = amg.inv_diag.astype(rdtype)
        # Pre-smooth.
        x = amg_omega * inv_diag * r
        # Coarse correction: restrict (reshape-sum), dense solve (MXU),
        # prolongate (broadcast).
        r2 = r - apply_A(x)
        rc = r2.reshape(nbR, bR, nbC, bC).sum(axis=(1, 3)).reshape(-1)
        xc = amg.Ac_inv.astype(rdtype) @ rc
        xf = jnp.repeat(
            jnp.repeat(xc.reshape(nbR, nbC), bR, axis=0), bC, axis=1
        )
        x = x + xf
        # Post-smooth (symmetric cycle).
        r3 = r - apply_A(x)
        return x + amg_omega * inv_diag * r3

    return apply_amg
