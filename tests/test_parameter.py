import pickle

import numpy as np
import pytest

from tdgl_tpu.parameter import CompositeParameter, Constant, Parameter


def linear_ramp(x, y, offset=0.0, scale=1.0):
    return scale * x + offset


def time_field(x, y, z, *, t):
    return np.stack([np.zeros_like(x), x * t, np.zeros_like(x)], axis=1)


def test_signature_validation():
    with pytest.raises(ValueError):
        Parameter(lambda a, b: a + b)

    def bad_positional(x, y, w):
        return x

    with pytest.raises(ValueError):
        Parameter(bad_positional)

    def z_wrong_place(x, y, w=1, z=2):
        return x

    with pytest.raises(ValueError):
        Parameter(z_wrong_place)

    with pytest.raises(ValueError):
        Parameter(linear_ramp, nonexistent_kwarg=2)

    with pytest.raises(ValueError):
        # time-dependent requires keyword-only t
        Parameter(linear_ramp, time_dependent=True)


def test_evaluate():
    p = Parameter(linear_ramp, scale=2.0)
    x = np.array([1.0, 2.0])
    y = np.zeros(2)
    assert np.allclose(p(x, y), [2.0, 4.0])


def test_scalar_output():
    p = Parameter(linear_ramp)
    assert p(1.0, 0.0) == 1.0
    assert isinstance(p(1.0, 0.0), float)


def test_time_dependent():
    p = Parameter(time_field, time_dependent=True)
    x = np.linspace(0, 1, 5)
    out = p(x, x, np.zeros(5), t=2.0)
    assert out.shape == (5, 3)
    assert np.allclose(out[:, 1], 2 * x)


def test_composite_algebra():
    a = Parameter(linear_ramp, scale=1.0)
    b = Parameter(linear_ramp, scale=2.0)
    x = np.array([1.0, 3.0])
    y = np.zeros(2)
    assert np.allclose((a + b)(x, y), 3 * x)
    assert np.allclose((a - b)(x, y), -x)
    assert np.allclose((a * b)(x, y), 2 * x**2)
    assert np.allclose((b / a)(x, y), 2.0)
    assert np.allclose((a**2)(x, y), x**2)
    assert np.allclose((2 * a)(x, y), 2 * x)
    assert np.allclose((1 + a)(x, y), 1 + x)
    assert isinstance(a + 1, CompositeParameter)


def test_composite_type_errors():
    a = Parameter(linear_ramp)
    with pytest.raises(TypeError):
        CompositeParameter(1, 2, "+")
    with pytest.raises(TypeError):
        CompositeParameter(a, "string", "+")
    with pytest.raises(ValueError):
        CompositeParameter(a, a, "%")


def test_equality():
    a = Parameter(linear_ramp, scale=1.0)
    b = Parameter(linear_ramp, scale=1.0)
    c = Parameter(linear_ramp, scale=2.0)
    assert a == b
    assert a != c
    assert (a + b) == (b + a)
    assert (a + b) != (a - b)
    assert a != 5


def test_pickle_roundtrip():
    p = Parameter(linear_ramp, scale=3.0)
    q = pickle.loads(pickle.dumps(p))
    x = np.array([1.0, 2.0])
    assert np.allclose(q(x, x), p(x, x))
    comp = pickle.loads(pickle.dumps(p + 1))
    assert np.allclose(comp(x, x), p(x, x) + 1)


def test_constant():
    c = Constant(5.0)
    x = np.linspace(0, 1, 7)
    assert np.allclose(c(x, x), 5.0)
    c3 = Constant(2.0, dimensions=3)
    assert np.allclose(c3(x, x, x), 2.0)
    with pytest.raises(ValueError):
        Constant(1.0, dimensions=4)


def test_cache():
    calls = []

    def counting(x, y, *, t):
        calls.append(t)
        return x * t

    p = Parameter(counting, time_dependent=True, use_cache=True)
    x = np.arange(3.0)
    p(x, x, t=1.0)
    p(x, x, t=1.0)
    assert len(calls) == 1
    p(x, x, t=2.0)
    assert len(calls) == 2
    p._clear_cache()
    p(x, x, t=2.0)
    assert len(calls) == 3
