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
    """Device arrays of the grid two-level preconditioner (a pytree).

    The whole V-cycle runs in **bfloat16** (measured: CG iteration counts
    are identical to an f32 preconditioner — preconditioner accuracy only
    shifts the preconditioned spectrum, not the solution), so the stencil
    tables are stored here as bf16 copies and the apply touches half the
    memory of the f32 operator.
    """

    Ac_inv: np.ndarray    # (nc, nc) dense pseudo-inverse of P^T A P (bf16)
    inv_diag: np.ndarray  # (Rp, Cp) — valid/diag(A), 0 at masked (bf16)
    w16: np.ndarray       # (3, Rp, Cp) — laplacian weights (bf16)
    wm16: np.ndarray      # (3, Rp, Cp) — shifted weights (bf16)
    sym16: np.ndarray     # (Rp, Cp) — diagonal (bf16)


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

    import jax.numpy as jnp

    bf16 = jnp.bfloat16
    inv_diag = np.where(
        np.asarray(sten.valid) > 0,
        1.0 / np.maximum(np.asarray(sten.sym_diag), 1e-30),
        0.0,
    )
    return GridAMGData(
        Ac_inv=jnp.asarray(Ac_inv.astype(np.float32)).astype(bf16),
        inv_diag=jnp.asarray(inv_diag.astype(np.float32)).astype(bf16),
        w16=jnp.asarray(np.asarray(sten.w, np.float32)).astype(bf16),
        wm16=jnp.asarray(np.asarray(sten.w_m, np.float32)).astype(bf16),
        sym16=jnp.asarray(np.asarray(sten.sym_diag, np.float32)
                          ).astype(bf16),
    )


def make_grid_amg_apply(amg_omega: float):
    """Returns the jax V-cycle apply ``(amg, r) -> z`` on grids (bf16)."""
    import jax.numpy as jnp

    from ..models.gtdgl_stencil import shift_m, shift_p

    bR, bC = BLOCK

    def apply_amg(amg, r):
        rdtype = r.dtype
        Rp, Cp = r.shape
        nbR, nbC = Rp // bR, Cp // bC
        omega = jnp.bfloat16(amg_omega)

        def apply16(x):
            acc = jnp.zeros_like(x)
            for k in range(3):
                acc = acc + amg.w16[k] * shift_p(x, k)
                acc = acc + amg.wm16[k] * shift_m(x, k)
            return x * amg.sym16 - acc   # A = -S

        r16 = r.astype(jnp.bfloat16)
        # Pre-smooth.
        x = omega * amg.inv_diag * r16
        # Coarse correction: restrict (reshape-sum), dense solve (MXU),
        # prolongate (broadcast).
        r2 = (r16 - apply16(x)).astype(jnp.float32)
        rc = r2.reshape(nbR, bR, nbC, bC).sum(axis=(1, 3)).reshape(-1)
        xc = amg.Ac_inv @ rc.astype(jnp.bfloat16)
        xf = jnp.repeat(
            jnp.repeat(xc.reshape(nbR, nbC), bR, axis=0), bC, axis=1
        )
        x = x + xf
        # Post-smooth (symmetric cycle).
        r3 = r16 - apply16(x)
        return (x + omega * amg.inv_diag * r3).astype(rdtype)

    return apply_amg
