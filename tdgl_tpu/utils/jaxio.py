"""Robust device->host transfer helpers.

Some PJRT backends (notably the tunneled axon TPU used in constrained
environments) implement device->host copies only for non-scalar real/integer
arrays: 0-d arrays, booleans, and complex arrays raise UNIMPLEMENTED. These
helpers reshape/decompose values on device so that every transfer is a
plain >=1-d real/int array, then reassemble on the host.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _split_complex(v):
    v = jnp.atleast_1d(v)
    return v.real, v.imag


@jax.jit
def _bool_to_int(v):
    return jnp.atleast_1d(v).astype(jnp.int32)


@jax.jit
def _at_least_1d(v):
    return jnp.atleast_1d(v)


def to_numpy(x) -> np.ndarray:
    """Fetch a jax array to host, tolerating scalar/bool/complex quirks.

    The decomposition runs inside ``jit``: on the quirky backend, f32 outputs
    of compiled programs transfer fine while eager-op outputs may not.
    """
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x)
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    try:
        return np.asarray(x)
    except Exception:
        pass
    squeeze = x.ndim == 0
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        re, im = _split_complex(x)
        out = np.asarray(re) + 1j * np.asarray(im)
    elif x.dtype == jnp.bool_:
        out = np.asarray(_bool_to_int(x)) != 0
    else:
        out = np.asarray(_at_least_1d(x))
    return out[0] if squeeze else out


def tree_to_numpy(tree: Any) -> Any:
    """``to_numpy`` over every leaf of a pytree."""
    return jax.tree.map(to_numpy, tree)


def host_scalar(x) -> float:
    """Fetch a scalar jax value as a python number."""
    value = to_numpy(x)
    return np.asarray(value).item()
