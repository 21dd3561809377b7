"""Electromagnetics tests, mirroring the reference ``tdgl/test/test_em.py``."""

import numpy as np
import pytest

from tdgl_tpu.em import (
    biot_savart,
    biot_savart_2d,
    convert_field,
    current_loop_field,
    current_loop_vector_potential,
    uniform_Bz_vector_potential,
)
from tdgl_tpu.utils.units import ureg

MU_0 = 1.25663706212e-06


def test_convert_field():
    # B <-> B
    out = convert_field(1.0, "G", old_units="mT")
    assert np.isclose(out.magnitude, 10.0)
    # B -> H
    H = convert_field(1.0, "A/m", old_units="T")
    assert np.isclose(H.magnitude, 1.0 / MU_0)
    # H -> B
    B = convert_field(1.0 / MU_0, "T", old_units="A/m")
    assert np.isclose(B.magnitude, 1.0)
    # string input
    out = convert_field("5 mT", "G")
    assert np.isclose(out.magnitude, 50.0)
    # without units
    val = convert_field(1.0, "G", old_units="mT", with_units=False)
    assert isinstance(val, float) and np.isclose(val, 10.0)
    with pytest.raises(ValueError):
        convert_field(np.array([1.0]), "G")


def test_uniform_Bz_vector_potential():
    positions = np.array([[1.0, 0.0, 0.0], [0.0, 2.0, 5.0]])
    A = uniform_Bz_vector_potential(positions, 2.0)
    # A = (B x r)/2 = Bz/2 (-y, x, 0)
    expected = np.array([[0.0, 1.0, 0.0], [-2.0, 0.0, 0.0]])
    assert np.allclose(A.magnitude, expected)
    # curl check on a square loop: oint A . dl = B * Area
    theta = np.linspace(0, 2 * np.pi, 5001)
    r = 3.0
    loop = np.stack([r * np.cos(theta), r * np.sin(theta),
                     np.zeros_like(theta)], axis=1)
    A_loop = uniform_Bz_vector_potential(loop, 1.0).magnitude
    dl = np.diff(loop, axis=0)
    circulation = np.sum(((A_loop[:-1] + A_loop[1:]) / 2 * dl).sum(axis=1))
    assert np.isclose(circulation, np.pi * r**2, rtol=1e-4)


def test_current_loop_field_center():
    """B at the center of a loop = mu0 I / (2 a)."""
    a_m = 1e-6  # 1 um in meters
    I_A = 1e-3  # 1 mA in amps
    B = current_loop_field(
        np.array([[0.0, 0.0, 1e-9]]),
        loop_center=(0, 0, 0), loop_radius=1.0, current=1000.0,
        length_units="um", current_units="uA",
    )
    expected = MU_0 * I_A / (2 * a_m)
    assert np.isclose(B.magnitude[0, 2], expected, rtol=1e-3)


def test_current_loop_field_on_axis():
    """On-axis field: B = mu0 I a^2 / (2 (a^2+z^2)^{3/2})."""
    z = 2.0
    B = current_loop_field(
        np.array([[0.0, 0.0, z]]),
        loop_center=(0, 0, 0), loop_radius=1.0, current=1000.0,
        length_units="um", current_units="uA",
    )
    a, I = 1e-6, 1e-3
    z_m = z * 1e-6
    expected = MU_0 * I * a**2 / (2 * (a**2 + z_m**2) ** 1.5)
    assert np.isclose(B.magnitude[0, 2], expected, rtol=1e-3)


def test_current_loop_vector_potential_circulation():
    """oint A . dl over a circle on the loop plane = enclosed flux;
    far from the loop the flux approaches the total dipole form and, for a
    loop radius >> circle radius, approx mu0 I / 2 * r^2/a ... — instead just
    check A is azimuthal and finite."""
    positions = np.array([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    A = current_loop_vector_potential(
        positions, loop_center=(0, 0, 0), loop_radius=1.0, current=100.0,
        length_units="um", current_units="uA",
    ).magnitude
    # Azimuthal: at (2,0,0), A ~ +y; at (0,2,0), A ~ -x
    assert abs(A[0, 1]) > 10 * abs(A[0, 0])
    assert abs(A[1, 0]) > 10 * abs(A[1, 1])
    assert np.isclose(np.linalg.norm(A[0]), np.linalg.norm(A[1]), rtol=1e-9)


def test_biot_savart_straight_wire():
    """A long straight wire: B = mu0 I / (2 pi d)."""
    n = 4001
    zs = np.linspace(-500, 500, n)  # meters (long!)
    seg = np.diff(zs)
    current_positions = np.stack(
        [np.zeros(n - 1), np.zeros(n - 1), (zs[:-1] + zs[1:]) / 2], axis=1
    )
    current_vectors = np.stack(
        [np.zeros(n - 1), np.zeros(n - 1), seg], axis=1
    )
    currents = np.ones(n - 1)
    B = biot_savart(
        np.array([[1.0, 0.0, 0.0]]),
        current_positions=current_positions,
        current_vectors=current_vectors,
        currents=currents,
    )
    expected = MU_0 / (2 * np.pi)  # I=1, d=1
    assert np.isclose(B.magnitude[0, 1], -expected, rtol=1e-3) or np.isclose(
        B.magnitude[0, 1], expected, rtol=1e-3
    )
    assert abs(B.magnitude[0, 0]) < 1e-12
    assert abs(B.magnitude[0, 2]) < 1e-12


def test_biot_savart_2d_sheet():
    """A uniform sheet current: Bz above the center ~ 0 by symmetry; the
    in-plane component approaches +-mu0 K / 2 for an infinite sheet."""
    xs = np.linspace(-50, 50, 101)
    ys = np.linspace(-50, 50, 101)
    X, Y = np.meshgrid(xs, ys)
    positions = np.stack([X.ravel(), Y.ravel()], axis=1)
    K = np.zeros((len(positions), 2))
    K[:, 0] = 1.0  # uniform K_x = 1 uA/um
    B = biot_savart_2d(
        np.array([0.0]), np.array([0.0]), np.array([1.0]),
        positions=positions, current_densities=K, z0=0,
        length_units="um", current_units="uA", vector=True,
    )
    Bz = B.magnitude[0, 2]
    By = B.magnitude[0, 1]
    assert abs(Bz) < 1e-9
    K_SI = 1.0  # 1 uA/um = 1 A/m
    expected = MU_0 * K_SI / 2
    assert np.isclose(abs(By), expected, rtol=0.05)
