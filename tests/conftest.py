"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding code
paths are exercised without TPU hardware (the driver separately dry-runs the
multichip path). Set platform/flags BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may import jax (registering a TPU plugin)
# before this file runs, making the env vars above ineffective. Force the
# platform through the config API as well, before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")
# Deregister any eagerly-registered accelerator plugin backends (the
# environment's sitecustomize registers a tunneled TPU plugin in every
# interpreter): with the tunnel in an outage window, merely *initializing*
# backends can hang the process even though jax_platforms selects cpu —
# observed 2026-08-18: jnp.asarray blocked >100 s under JAX_PLATFORMS=cpu.
# Popping the factory before any backend initialization makes CPU test
# runs immune to tunnel state.
try:
    from jax._src import xla_bridge as _xb

    for _plat in list(_xb._backend_factories):
        # Keep jax's own built-in platforms ("tpu" must stay registered:
        # pallas registers MLIR lowering rules against it at import time);
        # drop only externally-registered tunnel plugins.
        if _plat not in ("cpu", "tpu", "gpu", "cuda", "rocm"):
            _xb._backend_factories.pop(_plat, None)
except Exception:  # pragma: no cover — private API may move across jax
    pass
# Allow float64 solves in tests (explicit dtypes keep float32 paths float32).
jax.config.update("jax_enable_x64", True)

import matplotlib

matplotlib.use("Agg")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def transport_device():
    """Transport geometry mirroring the reference test fixture
    (``tdgl/test/conftest.py:8``): plus-shaped film, two holes, source/drain
    terminals, two probe points."""
    import tdgl_tpu as tdgl
    from tdgl_tpu.geometry import box, circle

    xi = 1.0
    layer = tdgl.Layer(coherence_length=xi, london_lambda=2, thickness=0.1)
    film = (
        tdgl.Polygon("film", points=box(10))
        .union(box(30, 4, points=400))
        .resample(501)
        .set_name("film")
    )
    hole = tdgl.Polygon("hole1", points=circle(1.5, center=(2, 2)))
    source = tdgl.Polygon(points=box(1e-2, 4, center=(-15, 0))).set_name(
        "source"
    )
    drain = source.copy().scale(xfact=-1).set_name("drain")
    device = tdgl.Device(
        "film",
        layer=layer,
        film=film,
        holes=[hole, hole.copy().scale(xfact=-1, yfact=-1).set_name("hole2")],
        terminals=[source, drain],
        probe_points=[(-10, 0), (10, 0)],
    )
    device.make_mesh(min_points=2000, smooth=100, max_edge_length=xi / 2)
    return device


@pytest.fixture(scope="session")
def transport_device_solution(transport_device, tmp_path_factory):
    import tdgl_tpu as tdgl

    options = tdgl.SolverOptions(
        dt_init=1e-3,
        solve_time=100,
        save_every=100,
        field_units="uT",
        current_units="uA",
        output_file=str(
            tmp_path_factory.mktemp("solutions") / "transport.h5"
        ),
    )
    return tdgl.solve(
        transport_device,
        options,
        applied_vector_potential=tdgl.ConstantField(10, field_units="uT"),
        terminal_currents=dict(source=10, drain=-10),
    )


@pytest.fixture(scope="session")
def box_device():
    import tdgl_tpu as tdgl
    from tdgl_tpu.geometry import box

    xi = 1.5
    layer = tdgl.Layer(coherence_length=xi, london_lambda=1.0, thickness=0.1)
    film = tdgl.Polygon("film", points=box(10)).resample(501)
    device = tdgl.Device("film", layer=layer, film=film)
    device.make_mesh(min_points=2000, smooth=40, max_edge_length=xi / 2)
    return device


@pytest.fixture(scope="session")
def box_device_solution_no_screening(box_device, tmp_path_factory):
    import tdgl_tpu as tdgl

    options = tdgl.SolverOptions(
        dt_init=1e-3,
        solve_time=20,
        save_every=100,
        field_units="uT",
        current_units="uA",
        output_file=str(
            tmp_path_factory.mktemp("solutions") / "box_no_screening.h5"
        ),
    )
    return tdgl.solve(
        box_device,
        options,
        applied_vector_potential=tdgl.ConstantField(50, field_units="uT"),
    )
