"""Time-ramp and scale-factor sources (reference ``tdgl/sources/scaling.py``)."""

from __future__ import annotations

from ..parameter import Parameter


def linear_ramp(x, y, z, *, t, tmin, tmax, initial: float = 0.0,
                final: float = 1.0):
    """Linearly interpolate from ``initial`` to ``final`` over [tmin, tmax],
    clamped outside the interval.

    Written branch-free so it works for both host floats and traced (jax)
    time values — a LinearRamp-scaled field can therefore run on the
    compiled fast path."""
    frac = (t - tmin) / (tmax - tmin)
    if hasattr(frac, "dtype"):  # traced / jax value
        import jax.numpy as jnp

        frac = jnp.clip(frac, 0.0, 1.0)
    else:
        frac = min(max(frac, 0.0), 1.0)
    return initial + (final - initial) * frac


def LinearRamp(*, tmin: float, tmax: float, initial: float = 0.0,
               final: float = 1.0) -> Parameter:
    """A time-dependent :class:`Parameter` ramping linearly from ``initial``
    to ``final`` between ``tmin`` and ``tmax``. Jax-traceable (runs on the
    compiled fast path when composed with jittable Parameters)."""
    if not tmax > tmin:
        raise ValueError(f"LinearRamp requires tmax > tmin (got tmin={tmin},"
                         f" tmax={tmax}).")
    return Parameter(
        linear_ramp,
        tmin=tmin,
        tmax=tmax,
        initial=initial,
        final=final,
        time_dependent=True,
        jittable=True,
    )


def Scale(func, **kwargs) -> Parameter:
    """Wrap an arbitrary time-dependent scale function
    ``func(x, y, z, *, t, **kwargs)`` as a :class:`Parameter`."""
    kwargs["time_dependent"] = True
    return Parameter(func, **kwargs)
