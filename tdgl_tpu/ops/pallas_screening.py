"""Fused Pallas TPU kernel for the screening pairwise sum.

Computes ``A[e, :] = sum_s J_w[s, :] / |r_e - r_s|`` — the dense O(E x S)
hot spot of screened TDGL (reference ``tdgl/solver/screening.py:12-75``).

The XLA fallback (:mod:`tdgl_tpu.ops.screening`) materializes a
``(block, S)`` reciprocal-distance tile in HBM between the distance
computation and the matmul. This kernel fuses both: for each edge block, it
sweeps site tiles resident in VMEM, computes ``rsqrt`` distances on the VPU,
and accumulates the ``(block, tile) @ (tile, 2)`` product on the MXU into a
VMEM accumulator — one HBM read per operand, one write per output tile.

Grid: ``(E / BLOCK_E, S / BLOCK_S)``, with the site axis innermost so the
accumulator lives across the inner sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_E = 512
BLOCK_S = 512


def _kernel(ec_ref, sites_ref, jw_ref, out_ref, acc_ref):
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    ex = ec_ref[:, 0:1]                    # (BE, 1)
    ey = ec_ref[:, 1:2]
    sx = sites_ref[:, 0:1].T               # (1, BS)
    sy = sites_ref[:, 1:2].T
    dx = ex - sx                           # (BE, BS)
    dy = ey - sy
    d2 = dx * dx + dy * dy
    inv = jax.lax.rsqrt(jnp.maximum(d2, jnp.float32(1e-30)))
    acc_ref[:, :] += jnp.dot(inv, jw_ref[:, :],
                             preferred_element_type=jnp.float32)

    num_s = pl.num_programs(1)

    @pl.when(j == num_s - 1)
    def _flush():
        out_ref[:, :] = acc_ref[:, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def induced_vector_potential_pallas(
    edge_centers: jax.Array,
    sites: jax.Array,
    J_weighted: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """Pallas version of :func:`tdgl_tpu.ops.screening.induced_vector_potential`.

    Args:
        edge_centers: ``(E, 2)`` evaluation positions.
        sites: ``(S, 2)`` source positions (must not coincide with any edge
            center; padding sites are placed far away with zero weight).
        J_weighted: ``(S, 2)`` weighted current density.
        interpret: Run in the Pallas interpreter (for CPU tests).

    Returns:
        ``(E, 2)`` float32 sums.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        # Compile for real TPUs; interpret elsewhere (CPU tests).
        interpret = jax.default_backend() != "tpu"
    E = edge_centers.shape[0]
    S = sites.shape[0]
    Ep = -(-E // BLOCK_E) * BLOCK_E
    Sp = -(-S // BLOCK_S) * BLOCK_S
    ec = jnp.pad(edge_centers.astype(jnp.float32), ((0, Ep - E), (0, 0)))
    # Pad sites FAR away with zero weight so padding contributes ~0 and
    # cannot produce infinities.
    st = jnp.pad(sites.astype(jnp.float32), ((0, Sp - S), (0, 0)),
                 constant_values=1e6)
    jw = jnp.pad(J_weighted.astype(jnp.float32), ((0, Sp - S), (0, 0)))

    grid = (Ep // BLOCK_E, Sp // BLOCK_S)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Ep, 2), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_E, 2), lambda i, j: (i, 0)),
            pl.BlockSpec((BLOCK_S, 2), lambda i, j: (j, 0)),
            pl.BlockSpec((BLOCK_S, 2), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_E, 2), lambda i, j: (i, 0)),
        scratch_shapes=[pltpu.VMEM((BLOCK_E, 2), jnp.float32)],
        interpret=interpret,
    )(ec, st, jw)
    return out[:E]
