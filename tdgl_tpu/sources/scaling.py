"""Time-ramp and scale-factor sources (reference ``tdgl/sources/scaling.py``)."""

from __future__ import annotations

from ..parameter import Parameter


def linear_ramp(x, y, z, *, t, tmin, tmax, initial: float = 0.0,
                final: float = 1.0):
    """Linearly interpolate from ``initial`` to ``final`` over [tmin, tmax],
    clamped outside the interval."""
    if t < tmin:
        return initial
    if t < tmax:
        return initial + (final - initial) * (t - tmin) / (tmax - tmin)
    return final


def LinearRamp(*, tmin: float, tmax: float, initial: float = 0.0,
               final: float = 1.0) -> Parameter:
    """A time-dependent :class:`Parameter` ramping linearly from ``initial``
    to ``final`` between ``tmin`` and ``tmax``."""
    return Parameter(
        linear_ramp,
        tmin=tmin,
        tmax=tmax,
        initial=initial,
        final=final,
        time_dependent=True,
    )


def Scale(func, **kwargs) -> Parameter:
    """Wrap an arbitrary time-dependent scale function
    ``func(x, y, z, *, t, **kwargs)`` as a :class:`Parameter`."""
    kwargs["time_dependent"] = True
    return Parameter(func, **kwargs)
