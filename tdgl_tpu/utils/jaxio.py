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


def _fetch_with_retry(thunk, attempts: int = 4) -> np.ndarray:
    """Run a compute+fetch thunk with backoff: the tunneled TPU backend
    intermittently fails otherwise-valid executions/transfers with
    UNIMPLEMENTED."""
    import time

    last = None
    for attempt in range(attempts):
        try:
            return np.asarray(thunk())
        except Exception as exc:  # jax.errors.JaxRuntimeError and friends
            last = exc
            time.sleep(min(2.0 * 4**attempt, 30.0))
    raise last


def to_numpy(x) -> np.ndarray:
    """Fetch a jax array to host, tolerating scalar/bool/complex quirks.

    The decomposition runs inside ``jit``: on the quirky backend, f32 outputs
    of compiled programs transfer fine while eager-op outputs may not.
    """
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x)
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.size == 0:
        # Zero-size buffers need no transfer (and some backends reject them).
        return np.empty(x.shape, dtype=np.dtype(x.dtype))
    try:
        return np.asarray(x)
    except Exception:
        pass
    squeeze = x.ndim == 0
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        out = (_fetch_with_retry(lambda: _split_complex(x)[0])
               + 1j * _fetch_with_retry(lambda: _split_complex(x)[1]))
    elif x.dtype == jnp.bool_:
        out = _fetch_with_retry(lambda: _bool_to_int(x)) != 0
    elif squeeze:
        out = _fetch_with_retry(lambda: _at_least_1d(x))
    else:
        # Ordinary real array: the direct transfer failed transiently; retry
        # it rather than routing through an auxiliary program.
        out = _fetch_with_retry(lambda: x)
    return out[0] if squeeze else out


def tree_to_numpy(tree: Any) -> Any:
    """``to_numpy`` over every leaf of a pytree."""
    return jax.tree.map(to_numpy, tree)


def host_scalar(x) -> float:
    """Fetch a scalar jax value as a python number."""
    value = to_numpy(x)
    return np.asarray(value).item()
