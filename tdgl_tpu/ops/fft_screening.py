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


def build_fft_screening(sten, maps, grid, dtype=np.float32,
                        mode: str = "edge") -> FFTScreeningData:
    """Build the convolution kernels for a structured mesh.

    Args:
        sten: Host :class:`StencilOperators` (for ``edge_dirs``).
        maps: :class:`GridMaps` (padded shape).
        grid: The mesh's :class:`HexGrid` (dimensionless spacing).
        dtype: Real dtype of the solve (sets the spectrum precision).
        mode: ``"edge"`` — one exact kernel per edge class (evaluates the
            pairwise sum at edge centers exactly; 2 forward + 6 inverse
            transforms per application). ``"site"`` — a single site-to-site
            kernel (2 forward + 2 inverse transforms); edge-center values
            are then midpoint-interpolated from the two endpoint sites
            (:func:`induced_vector_potential_fft_site`), trading exactness
            of the *discrete kernel* (the smooth induced potential is
            interpolated at second order; the self-cell term integrates
            ``1/r`` over the Voronoi cell) for ~2x fewer transforms.
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
    if mode == "site":
        dist = np.sqrt(dx**2 + dy**2)
        dist[0, 0] = 1.0
        G = (1.0 / dist)[None, :, :]
        # Self term: the source cell's own contribution to A at its center,
        # int_cell (1/r) dA / a = 2 sqrt(pi / a) for a disk of equal area
        # (the hex cell is within ~1% of its equivalent disk for this
        # integral). Jw carries J * a, so the kernel value divides by a.
        a_cell = h * h * np.sqrt(3.0) / 2.0
        G[0, 0, 0] = 2.0 * np.sqrt(np.pi / a_cell)
        G = G.astype(rdt)
    else:
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


def induced_vector_potential_fft_site(
    fft_data: FFTScreeningData, sten, J_weighted: jax.Array
) -> jax.Array:
    """Induced vector potential via the site-to-site kernel plus midpoint
    interpolation to edge centers (``mode="site"`` of
    :func:`build_fft_screening`): 4 real transforms per application instead
    of 8. The induced potential is a smooth (1/r-smeared) field, so the
    midpoint average of the two endpoint values is second-order accurate;
    the discrete-kernel difference vs the exact per-class evaluation is
    O(1%) locally (validated against the pairwise kernel in tests).

    Args / returns: as :func:`induced_vector_potential_fft`.
    """
    from ..models.gtdgl_stencil import shift_p

    rdtype = J_weighted.dtype
    Rp, Cp = J_weighted.shape[:2]
    Jw = jnp.pad(J_weighted, ((0, Rp), (0, Cp), (0, 0)))
    Jhat = jnp.fft.rfft2(Jw, axes=(0, 1))          # (2Rp, Cp+1, 2)
    jr = Jhat.real
    ji = Jhat.imag
    gr = fft_data.Ghat_re[0, :, :, None].astype(jr.dtype)
    gi = fft_data.Ghat_im[0, :, :, None].astype(jr.dtype)
    prod = jax.lax.complex(gr * jr - gi * ji, gr * ji + gi * jr)
    A_site = jnp.fft.irfft2(prod, s=(2 * Rp, 2 * Cp), axes=(0, 1))
    A_site = A_site[:Rp, :Cp, :]
    A_edge = jnp.stack(
        [0.5 * (A_site + shift_p(A_site, k)) for k in range(3)]
    )
    return (A_edge * sten.edge_valid[..., None].astype(A_edge.dtype)
            ).astype(rdtype)
