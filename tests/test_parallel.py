"""Multi-device sweep tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

import tdgl_tpu as tdgl
from tdgl_tpu.geometry import box
from tdgl_tpu.parallel import solve_sweep


@pytest.fixture(scope="module")
def small_box_device():
    layer = tdgl.Layer(coherence_length=1.0, london_lambda=2, thickness=0.1)
    film = tdgl.Polygon("film", points=box(8)).resample(100)
    device = tdgl.Device("film", layer=layer, film=film,
                         probe_points=[(-3, 0), (3, 0)])
    device.make_mesh(min_points=400, smooth=20)
    return device


def test_field_sweep_sharded(small_box_device):
    assert len(jax.devices()) == 8
    options = tdgl.SolverOptions(
        solve_time=5, dt_init=1e-4, save_every=200,
        field_units="uT", current_units="uA",
    )
    fields = np.linspace(0, 200, 8)
    result = solve_sweep(
        small_box_device,
        options,
        applied_vector_potential=tdgl.ConstantField(1.0, field_units="uT"),
        field_scales=fields,
        max_steps=20000,
    )
    assert result.psi.shape[0] == 8
    assert np.all(result.steps > 0)
    # Zero field: |psi| ~ 1 everywhere. Strong field: suppressed somewhere.
    assert np.abs(result.psi[0]).min() > 0.9
    assert np.abs(result.psi[-1]).min() < 0.85
    # Each member took its own number of steps (adaptive dt is per-member).
    assert result.dynamics_dt.shape[0] == 8
    assert np.all((result.dynamics_dt >= 0))


def test_sweep_validation(small_box_device):
    options = tdgl.SolverOptions(solve_time=1)
    with pytest.raises(ValueError):
        solve_sweep(small_box_device, options)
    with pytest.raises(ValueError):
        solve_sweep(small_box_device, options, field_scales=[1],
                    current_scales=[1])
