"""Pallas screening kernel: parity with the XLA path (interpreter mode on
the CPU test mesh; the same kernel compiles for real TPU cores)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tdgl_tpu.ops.pallas_screening import induced_vector_potential_pallas
from tdgl_tpu.ops.screening import induced_vector_potential


@pytest.mark.parametrize("E,S", [(64, 64), (700, 900), (1500, 300)])
def test_pallas_matches_xla(E, S):
    rng = np.random.default_rng(E + S)
    ec = rng.uniform(-5, 5, (E, 2)).astype(np.float32)
    st = rng.uniform(-5, 5, (S, 2)).astype(np.float32) + 1e-3
    jw = rng.normal(size=(S, 2)).astype(np.float32)
    ref = np.asarray(
        induced_vector_potential(jnp.asarray(ec), jnp.asarray(st),
                                 jnp.asarray(jw))
    )
    out = np.asarray(
        induced_vector_potential_pallas(jnp.asarray(ec), jnp.asarray(st),
                                        jnp.asarray(jw), interpret=True)
    )
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-5
