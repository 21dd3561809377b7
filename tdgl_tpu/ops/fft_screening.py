"""Screening (induced vector potential) as an exact FFT convolution.

The reference evaluates ``A[e] = sum_s J_w[s] / |r_e - r_s|`` as a dense
O(E x S) pairwise sum (Numba/CuPy kernels, ``tdgl/solver/screening.py``),
and so do :mod:`tdgl_tpu.ops.screening` (XLA) and
:mod:`tdgl_tpu.ops.pallas_screening`. On a **structured lattice mesh** the
sum collapses: site positions are an affine function of the grid indices and
each edge class's centers sit at a fixed offset (half the class direction)
from the lattice points, so the distance depends only on the index
displacement:

    |ec_k(r, c) - pos(r + dr, c + dc)| = |e_k / 2 - L (dr, dc)|

with ``L`` the lattice index->cartesian map. The pairwise sum is therefore a
translation-invariant convolution per edge class, computed exactly with
zero-padded real FFTs in O(N log N) instead of O(N^2) — ~1000x less
arithmetic at the 50k-site benchmark scale, on top of avoiding the giant
pairwise intermediate entirely. Masked/padded sites carry zero weight, so
the clipped film geometry is handled for free.

Kernels (``1/dist`` tables and their rffts) are precomputed on the host once
per mesh.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class FFTScreeningData(NamedTuple):
    """Precomputed convolution kernels (a pytree).

    The rfft2 spectra of the per-edge-class ``1/dist`` kernels on the
    zero-padding-doubled grid, stored as **separate real/imaginary arrays**
    (``(3, 2*Rp, Cp + 1)`` each): the TPU runtime used here faults on
    complex-typed elementwise multiplies, so the spectrum product runs in
    split-complex arithmetic.
    """

    Ghat_re: jax.Array
    Ghat_im: jax.Array


def build_fft_screening(sten, maps, grid, dtype=np.float32
                        ) -> FFTScreeningData:
    """Build the per-edge-class convolution kernels for a structured mesh.

    Args:
        sten: Host :class:`StencilOperators` (for ``edge_dirs``).
        maps: :class:`GridMaps` (padded shape).
        grid: The mesh's :class:`HexGrid` (dimensionless spacing).
        dtype: Real dtype of the solve (sets the spectrum precision).
    """
    Rp, Cp = maps.shape
    h = float(grid.spacing)
    R2, C2 = 2 * Rp, 2 * Cp
    # Index displacement grids in circular-convolution layout: frequency bin
    # i represents displacement i for i < Rp and i - 2*Rp for i >= Rp.
    dr = np.arange(R2)
    dr = np.where(dr >= Rp, dr - R2, dr).astype(np.float64)
    dc = np.arange(C2)
    dc = np.where(dc >= Cp, dc - C2, dc).astype(np.float64)
    DR, DC = np.meshgrid(dr, dc, indexing="ij")
    # Lattice map: pos(r, c) = origin + ((c + r/2) h, r (sqrt(3)/2) h).
    dx = (DC + 0.5 * DR) * h
    dy = DR * (np.sqrt(3) / 2) * h
    rdt = np.float64 if dtype == np.float64 else np.float32
    dirs = np.asarray(sten.edge_dirs, np.float64)  # (3, 2), length h
    G = np.empty((3, R2, C2), rdt)
    for k in range(3):
        # A[e] = sum_s G[e - s] Jw[s] with G[delta] =
        # 1/|L(delta) + e_k/2| (ec(e) - pos(s) for delta = e - s).
        ox, oy = 0.5 * dirs[k]
        dist = np.sqrt((ox + dx) ** 2 + (oy + dy) ** 2)
        # Never singular: edge centers are never lattice points.
        G[k] = (1.0 / dist).astype(rdt)
    Ghat = np.fft.rfft2(G, axes=(1, 2))
    return FFTScreeningData(
        Ghat_re=jnp.asarray(Ghat.real.astype(rdt)),
        Ghat_im=jnp.asarray(Ghat.imag.astype(rdt)),
    )


def induced_vector_potential_fft(
    fft_data: FFTScreeningData, sten, J_weighted: jax.Array
) -> jax.Array:
    """Induced vector potential on all edge classes via FFT convolution.

    Args:
        fft_data: :class:`FFTScreeningData` for this mesh.
        sten: :class:`StencilOperators` (device arrays; for the edge mask).
        J_weighted: ``(Rp, Cp, 2)`` site current density times site area and
            physical prefactor (zero at masked sites).

    Returns:
        ``(3, Rp, Cp, 2)`` float32 induced vector potential at edge centers
        (zero at masked edges).
    """
    rdtype = J_weighted.dtype
    Rp, Cp = J_weighted.shape[:2]
    # A_k[e] = sum_s G_k[e - s] Jw[s] per cartesian component: zero-pad Jw,
    # multiply spectra (split-complex — see FFTScreeningData), transform
    # back, take the unaliased quadrant.
    Jw = jnp.pad(J_weighted, ((0, Rp), (0, Cp), (0, 0)))
    Jhat = jnp.fft.rfft2(Jw, axes=(0, 1))          # (2Rp, Cp+1, 2)
    jr = Jhat.real[None]
    ji = Jhat.imag[None]
    gr = fft_data.Ghat_re[:, :, :, None].astype(jr.dtype)
    gi = fft_data.Ghat_im[:, :, :, None].astype(jr.dtype)
    prod = jax.lax.complex(gr * jr - gi * ji, gr * ji + gi * jr)
    A = jnp.fft.irfft2(prod, s=(2 * Rp, 2 * Cp), axes=(1, 2))
    A = A[:, :Rp, :Cp, :]
    return (A * sten.edge_valid[..., None].astype(A.dtype)).astype(rdtype)
