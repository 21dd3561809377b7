"""Distributed FFT screening for spatially-sharded solves.

Round 3 replicated the FFT spectra under spatial sharding: the induced-
vector-potential convolution all-gathered J and computed the full
transform on every device — correct, but the one quadratic-cost component
did not actually scale across chips (VERDICT r3 #4). This module computes
the SAME convolution (``ops/fft_screening.py``) with a classic
**pencil decomposition** inside :func:`jax.shard_map`:

1. cols leg (local): zero-pad cols to ``2 Cp``, ``rfft`` along cols on
   this device's row block → ``(Rp/n, Cp+1)`` spectrum rows;
2. transpose (``all_to_all`` over the ``rows`` mesh axis): each device
   now owns a column *pencil* ``(Rp, cpad/n)``;
3. rows leg (local): zero-extend rows to ``2 Rp`` (the padding rows are
   identically zero), complex ``fft`` along rows, multiply by this
   device's column shard of the precomputed ``Ghat`` kernels
   (split-complex product), ``ifft`` back, crop to the unaliased ``Rp``
   rows;
4. transpose back (``all_to_all``), ``irfft`` along cols, crop to ``Cp``.

Per-device FFT work and spectrum memory are ``1/n`` of the replicated
evaluation (the kernels ``Ghat`` are stored column-sharded), at the cost
of two all-to-alls of the J spectrum over ICI. Parity with the replicated
path is pinned by ``tests/test_parallel.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fft_screening import FFTScreeningData

_AXIS = "rows"

__all__ = ["make_sharded_fft_screening"]


def _cpad(Cp: int, n_dev: int) -> int:
    """Column-spectrum length padded to a multiple of the device count."""
    nbins = Cp + 1
    return ((nbins + n_dev - 1) // n_dev) * n_dev


def pad_fft_data_for_sharding(fft_data: FFTScreeningData, n_dev: int,
                              mesh: Mesh) -> FFTScreeningData:
    """Zero-pad the kernel spectra's column axis to a multiple of
    ``n_dev`` and place them column-sharded over ``mesh`` (axis
    ``rows``): each device stores ``1/n`` of the spectra."""
    re = np.asarray(fft_data.Ghat_re)
    im = np.asarray(fft_data.Ghat_im)
    nbins = re.shape[-1]
    Cp = nbins - 1
    pad = _cpad(Cp, n_dev) - nbins
    re = np.pad(re, ((0, 0), (0, 0), (0, pad)))
    im = np.pad(im, ((0, 0), (0, 0), (0, pad)))
    sh = NamedSharding(mesh, P(None, None, _AXIS))
    return FFTScreeningData(
        Ghat_re=jax.device_put(jnp.asarray(re), sh),
        Ghat_im=jax.device_put(jnp.asarray(im), sh),
    )


def make_sharded_fft_screening(mesh: Mesh, Rp: int, Cp: int):
    """Build ``eval_fn(fft_data, sten, J_weighted) -> (3, Rp, Cp, 2)``
    computing the induced-potential convolution with per-device pencil
    FFTs (``fft_data`` must be the padded/sharded form from
    :func:`pad_fft_data_for_sharding`).

    Returns None when the grid cannot be pencil-decomposed over this mesh
    (``Rp`` not divisible by the device count); callers fall back to the
    replicated evaluation.
    """
    n_dev = int(np.prod(list(mesh.shape.values())))
    if n_dev <= 1 or Rp % n_dev != 0:
        return None
    cpad = _cpad(Cp, n_dev)
    nbins = Cp + 1

    def local_eval(ghat_re, ghat_im, edge_valid, Jw):
        # Jw: (Rp/n, Cp, 2) local row block.
        rdtype = Jw.dtype
        # 1. cols leg: zero-pad to 2 Cp, rfft along cols.
        Jp = jnp.pad(Jw, ((0, 0), (0, Cp), (0, 0)))
        F1 = jnp.fft.rfft(Jp, axis=1)                # (Rp/n, Cp+1, 2) c64
        F1 = jnp.pad(F1, ((0, 0), (0, cpad - nbins), (0, 0)))
        # 2. transpose to column pencils.
        F1 = jax.lax.all_to_all(F1, _AXIS, split_axis=1, concat_axis=0,
                                tiled=True)          # (Rp, cpad/n, 2)
        # 3. rows leg: zero-extend rows to 2 Rp (padding rows are zero),
        #    complex fft, split-complex kernel product, ifft, crop rows.
        F2 = jnp.fft.fft(jnp.pad(F1, ((0, Rp), (0, 0), (0, 0))),
                         axis=0)                     # (2Rp, cpad/n, 2)
        gr = ghat_re[:, :, :, None].astype(F2.real.dtype)
        gi = ghat_im[:, :, :, None].astype(F2.real.dtype)
        jr = F2.real[None]
        ji = F2.imag[None]
        prod = jax.lax.complex(gr * jr - gi * ji, gr * ji + gi * jr)
        A2 = jnp.fft.ifft(prod, axis=1)              # (3, 2Rp, cpad/n, 2)
        A2 = A2[:, :Rp]                              # unaliased rows
        # 4. transpose back, irfft along cols, crop.
        A1 = jax.lax.all_to_all(A2, _AXIS, split_axis=1, concat_axis=2,
                                tiled=True)          # (3, Rp/n, cpad, 2)
        A1 = A1[:, :, :nbins]
        A = jnp.fft.irfft(A1, n=2 * Cp, axis=2)      # (3, Rp/n, 2Cp, 2)
        A = A[:, :, :Cp, :]
        return (A * edge_valid[..., None].astype(A.dtype)).astype(rdtype)

    shard_map = jax.shard_map

    sharded = shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(None, None, _AXIS), P(None, None, _AXIS),
                  P(None, _AXIS, None), P(_AXIS, None, None)),
        out_specs=P(None, _AXIS, None, None),
    )

    def eval_fn(fft_data, sten, J_weighted):
        return sharded(fft_data.Ghat_re, fft_data.Ghat_im,
                       sten.edge_valid, J_weighted)

    return eval_fn
