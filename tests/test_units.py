import numpy as np
import pytest

from tdgl_tpu.utils.units import DimensionalityError, Quantity, parse_units, ureg


def test_parse_simple():
    scale, dims = parse_units("uA")
    assert np.isclose(scale, 1e-6)
    assert dims == (0, 0, 0, 1)


def test_parse_compound():
    scale, dims = parse_units("uA / um")
    assert np.isclose(scale, 1.0)
    assert dims == (-1, 0, 0, 1)


def test_parse_exponent():
    scale, dims = parse_units("A * um**2")
    assert np.isclose(scale, 1e-12)
    assert dims == (2, 0, 0, 1)
    scale, dims = parse_units("uA / um ** 2")
    assert np.isclose(scale, 1e-6 / 1e-12)
    assert dims == (-2, 0, 0, 1)


def test_parse_inverse():
    scale, dims = parse_units("1 / um")
    assert np.isclose(scale, 1e6)
    assert dims == (-1, 0, 0, 0)


def test_tesla_vs_gauss():
    mT = ureg("mT")
    G = ureg("G")
    assert np.isclose(mT.to("G").magnitude, 10.0)
    assert np.isclose((10 * G).to("mT").magnitude, 1.0)


def test_flux_quantum():
    Phi_0 = ureg("Phi_0")
    assert np.isclose(Phi_0.to("Wb").magnitude, 2.067833848e-15)
    # Phi_0 = h / 2e
    h = ureg("h")
    e = ureg("e")
    ratio = (h / (2 * e) / Phi_0).to_base_units()
    assert ratio.dimensionless
    assert np.isclose(ratio.magnitude, 1.0, rtol=1e-8)


def test_bc2_scale():
    """B_c2 = Phi_0 / (2 pi xi^2) for xi = 1 um should be ~0.329 mT."""
    xi = 1.0 * ureg("um")
    Bc2 = (ureg("Phi_0") / (2 * np.pi * xi**2)).to("mT")
    assert np.isclose(Bc2.magnitude, 0.3291059, rtol=1e-5)


def test_tau0():
    """tau0 = mu_0 * sigma * lambda^2."""
    sigma = 6.7 * ureg("siemens / um")
    lam = 2.0 * ureg("um")
    tau0 = (ureg("mu_0") * sigma * lam**2).to("seconds")
    assert tau0.magnitude > 0
    assert np.isclose(tau0.magnitude, 1.25663706212e-6 * 6.7e6 * (2e-6) ** 2)


def test_add_sub():
    a = 1 * ureg("mA")
    b = 500 * ureg("uA")
    assert np.isclose((a + b).to("mA").magnitude, 1.5)
    assert np.isclose((a - b).to("uA").magnitude, 500)
    with pytest.raises(DimensionalityError):
        _ = a + 1 * ureg("um")


def test_to_quantity_target():
    """Conversion to a Quantity target (used in the reference solver at
    tdgl/solver/solver.py:307, `.to(1 / length_units)`)."""
    length_units = ureg("um")
    # A_scale = mu_0 * K0 / A0 with K0 ~ uA/um and A0 ~ mT * um has dims 1/length
    q = (ureg("mu_0") * ureg("uA/um") / (ureg("mT") * ureg("um"))).to(
        1 / length_units
    )
    assert q.dims == (-1, 0, 0, 0)


def test_dimensionless_magnitude():
    J_scale = (ureg("uA") / ureg("um") / (ureg("uA / um"))).to_base_units()
    assert J_scale.dimensionless
    assert np.isclose(J_scale.magnitude, 1.0)


def test_array_magnitude():
    q = Quantity.from_units(np.array([1.0, 2.0]), "mT")
    out = q.to("G")
    assert np.allclose(out.magnitude, [10.0, 20.0])


def test_comparisons():
    assert 1 * ureg("mT") > 5 * ureg("G")
    assert 1 * ureg("mT") == 10 * ureg("G")
