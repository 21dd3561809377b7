"""Solution/post-processing tests, mirroring the reference
``tdgl/test/test_solution.py``."""

import os
import tempfile

import h5py
import numpy as np
import pytest

import tdgl_tpu as tdgl
from tdgl_tpu.solution.data import get_current_through_paths
from tdgl_tpu.solution.solution import Solution


def test_boundary_phase_winding(box_device_solution_no_screening):
    """With no applied transport current and a simply-connected film, the
    total winding of the boundary phase is ~0 (no net fluxoid through the
    film boundary region without vortices having entered... vortices may
    enter, so winding is an integer)."""
    solution = box_device_solution_no_screening
    phases = solution.boundary_phases()
    assert set(phases) == {"film"}
    winding = (phases["film"].phases[-1] - phases["film"].phases[0]) / (
        2 * np.pi
    )
    assert np.isclose(winding, round(winding), atol=1e-6)


def test_save_and_load_solution(box_device_solution_no_screening):
    solution = box_device_solution_no_screening
    path = tempfile.mktemp(suffix=".h5")
    solution.to_hdf5(path)
    loaded = Solution.from_hdf5(path)
    assert loaded.equals(solution)
    assert loaded == loaded
    assert loaded.equals(solution, require_same_timestamp=True)
    loaded.delete_hdf5()


def test_tdgl_data(box_device_solution_no_screening):
    solution = box_device_solution_no_screening
    data = solution.tdgl_data
    n = len(solution.device.mesh.sites)
    e = len(solution.device.mesh.edge_mesh.edges)
    assert data.psi.shape == (n,)
    assert data.mu.shape == (n,)
    assert data.supercurrent.shape == (e,)
    assert data.applied_vector_potential.shape == (e, 2)
    # The semi-implicit scheme overshoots |psi| = 1 by O(dt_max) near moving
    # vortices (verified to shrink with dt_max); this is a soft sanity bound.
    assert np.all(np.abs(data.psi) <= 1.1)
    assert solution.data_range[0] == 0
    # Load a different step
    solution2 = Solution.from_hdf5(solution.path, solve_step=1)
    assert solution2.solve_step == 1


def test_dynamics(transport_device_solution):
    solution = transport_device_solution
    dynamics = solution.dynamics
    assert dynamics.time.shape == dynamics.dt.shape
    assert np.all(dynamics.dt > 0)
    v = dynamics.voltage()
    assert v.shape == dynamics.time.shape
    mean_v = dynamics.mean_voltage(tmin=5)
    assert np.isfinite(mean_v)
    resampled = dynamics.resample(2000)
    assert len(resampled.time) == 2000
    assert np.isclose(resampled.time[-1], dynamics.time[-1], rtol=1e-2)
    dphi = dynamics.phase_difference()
    assert dphi.shape == v.shape
    ix = dynamics.time_slice(tmin=1, tmax=5)
    assert np.all((dynamics.time[ix] >= 1) & (dynamics.time[ix] <= 5))
    assert 0 <= dynamics.closest_time(2.0) < len(dynamics.time)


def test_vorticity_and_current_density(box_device_solution_no_screening):
    solution = box_device_solution_no_screening
    n = len(solution.device.mesh.sites)
    K = solution.current_density
    assert K.magnitude.shape == (n, 2)
    w = solution.vorticity
    assert w.magnitude.shape == (n,)


def test_magnetic_moment(box_device_solution_no_screening):
    solution = box_device_solution_no_screening
    m = solution.magnetic_moment(units="uA * um ** 2")
    # Diamagnetic response: the moment opposes the +z applied field.
    assert m.magnitude < 0
    m2 = solution.magnetic_moment(with_units=False)
    assert isinstance(m2, float)


def test_field_at_position(box_device_solution_no_screening):
    solution = box_device_solution_no_screening
    positions = np.array([[0.0, 0.0], [2.0, 3.0]])
    B = solution.field_at_position(positions, zs=5.0, with_units=False)
    assert B.shape == (2,)
    # The screening response should oppose the applied field above the film.
    assert B[0] < 0
    Bv = solution.field_at_position(positions, zs=5.0, vector=True,
                                    with_units=False)
    assert Bv.shape == (2, 3)
    both = solution.field_at_position(positions, zs=5.0, with_units=False,
                                      return_sum=False)
    assert np.allclose(both.supercurrent + both.normal_current, B)
    with pytest.raises(ValueError):
        solution.field_at_position(np.array([[0.0, 0.0]]), zs=0.0)


def test_vector_potential_at_position(box_device_solution_no_screening):
    solution = box_device_solution_no_screening
    positions = np.array([[1.0, 2.0]])
    A = solution.vector_potential_at_position(positions, zs=3.0,
                                              with_units=False)
    assert A.shape == (1, 3)
    parts = solution.vector_potential_at_position(
        positions, zs=3.0, with_units=False, return_sum=False
    )
    total = sum(parts.values())
    assert np.allclose(total, A)


def test_interp_order_parameter(box_device_solution_no_screening):
    solution = box_device_solution_no_screening
    pts = np.array([[0.0, 0.0], [1.0, 1.0]])
    psi = solution.interp_order_parameter(pts)
    assert psi.shape == (2,)
    # Soft bound: semi-implicit transients overshoot |psi|=1 by O(dt_max).
    assert np.all(np.abs(psi) <= 1.1)


def test_hole_fluxoid(transport_device_solution):
    solution = transport_device_solution
    fluxoid = solution.hole_fluxoid("hole1")
    total = fluxoid.flux_part.magnitude + fluxoid.supercurrent_part.magnitude
    # The fluxoid should be nearly an integer multiple of Phi_0
    assert abs(total - round(total)) < 0.1


def test_current_through_paths_time_series(transport_device_solution):
    solution = transport_device_solution
    # The path must span the full film cross-section at x=0 (the square is
    # 10 wide there; a shorter path undercounts the spread-out current).
    ys = np.linspace(-5, 5, 501)
    path = np.stack([np.zeros_like(ys), ys], axis=1)
    times, currents = get_current_through_paths(
        solution.path, path, with_units=False, progress_bar=False
    )
    assert len(times) == len(currents)
    # Late-time current should match the 10 uA bias within 10%.
    assert np.isclose(np.mean(currents[len(currents) // 2:]), 10, rtol=0.1)


def test_solution_equality_and_copy(box_device_solution_no_screening):
    solution = box_device_solution_no_screening
    assert solution.equals(solution)
    assert not solution.equals("not a solution")
    assert solution.saved_on_disk


def test_plot_functions(box_device_solution_no_screening):
    import matplotlib.pyplot as plt

    solution = box_device_solution_no_screening
    fig, _ = solution.plot_order_parameter()
    plt.close(fig)
    fig, _ = solution.plot_currents()
    plt.close(fig)
    fig, _ = solution.plot_vorticity()
    plt.close(fig)
    fig, _ = solution.plot_scalar_potential()
    plt.close(fig)
    fig, _ = solution.dynamics.plot_dt()
    plt.close(fig)
