import os
import pickle
import tempfile

import h5py
import numpy as np
import pytest

from tdgl_tpu.device.device import Device
from tdgl_tpu.device.layer import Layer
from tdgl_tpu.device.polygon import Polygon
from tdgl_tpu.geometry import box, circle


@pytest.fixture(scope="module")
def device():
    layer = Layer(london_lambda=2, coherence_length=0.5, thickness=0.05,
                  conductivity=10.0)
    film = Polygon("film", points=box(10)).union(
        box(30, 4, points=400)
    ).resample(501).set_name("film")
    holes = [
        Polygon("hole1", points=circle(1.0, center=(2, 1.5))),
        Polygon("hole2", points=circle(1.0, center=(-2, -1.5))),
    ]
    terminals = [
        Polygon("source", points=box(1.2, 5, center=(-15, 0))),
        Polygon("drain", points=box(1.2, 5, center=(15, 0))),
    ]
    dev = Device(
        "transport",
        layer=layer,
        film=film,
        holes=holes,
        terminals=terminals,
        probe_points=[(-8, 0), (8, 0)],
        length_units="um",
    )
    dev.make_mesh(min_points=1800, smooth=50)
    return dev


def test_scales(device):
    assert np.isclose(device.kappa, 4.0)
    Bc2_mT = device.Bc2.to("mT").magnitude
    # Bc2 = Phi_0 / (2 pi xi^2), xi = 0.5 um
    assert np.isclose(Bc2_mT, 2.067833848e-15 / (2 * np.pi * 0.25e-12) / 1e-3,
                      rtol=1e-6)
    assert device.A0.to("mT * um").magnitude == pytest.approx(
        Bc2_mT * 0.5, rel=1e-6
    )
    K0 = device.K0.to("uA / um").magnitude
    assert K0 > 0
    tau0_s = device.tau0().to("seconds").magnitude
    assert tau0_s > 0
    V0 = device.V0().to("volts").magnitude
    assert V0 > 0


def test_mesh_properties(device):
    mesh = device.mesh
    assert len(mesh.sites) >= 1800
    stats = device.mesh_stats_dict()
    assert stats["num_sites"] == len(mesh.sites)
    # dimensionless: max edge should be ~<= 1 (units of xi)
    assert stats["max_edge_length"] <= 1.0 * device.layer.coherence_length
    # Voronoi areas partition the film area exactly (in units of xi^2)
    film_area = device.film.area
    hole_area = sum(h.area for h in device.holes)
    mesh_area = device.areas.sum()
    assert mesh_area == pytest.approx(film_area - hole_area, rel=0.02)


def test_terminal_info(device):
    info = device.terminal_info()
    names = {t.name for t in info}
    assert names == {"source", "drain"}
    for t in info:
        assert len(t.site_indices) > 0
        assert len(t.boundary_edge_indices) > 0
        assert t.length > 0
        # terminal length should be ~5 um (the side of the strip it spans is 4)
        assert 2 < t.length < 7


def test_probe_points(device):
    ix = device.probe_point_indices
    assert len(ix) == 2
    xi = device.layer.coherence_length
    assert np.allclose(device.mesh.sites[ix] * xi, device.probe_points,
                       atol=0.5)


def test_contains_points(device):
    assert device.contains_points([(0, 0)]).all()
    # inside hole1
    assert not device.contains_points([(2, 1.5)]).any()
    assert not device.contains_points([(0, 8)]).any()


def test_boundary_sites(device):
    bs = device.boundary_sites()
    assert set(bs) == {"film", "hole1", "hole2"}
    for name, loop in bs.items():
        assert loop is not None and len(loop) > 8


def test_transforms(device):
    moved = device.translate(1.0, -2.0)
    assert np.allclose(
        moved.film.centroid, np.asarray(device.film.centroid) + [1, -2]
    )
    assert np.allclose(moved.probe_points, [(-7, -2), (9, -2)])
    rotated = device.rotate(90)
    assert np.allclose(rotated.probe_points, [(0, -8), (0, 8)], atol=1e-9)
    scaled = device.scale(xfact=2)
    assert np.allclose(scaled.probe_points, [(-16, 0), (16, 0)])


def test_hdf5_roundtrip(device):
    path = tempfile.mktemp(suffix=".h5")
    device.to_hdf5(path)
    loaded = Device.from_hdf5(path)
    os.remove(path)
    assert loaded == device
    assert loaded.mesh is not None
    assert np.allclose(loaded.mesh.sites, device.mesh.sites)
    assert np.allclose(loaded.mesh.areas, device.mesh.areas)


def test_pickle_roundtrip(device):
    loaded = pickle.loads(pickle.dumps(device))
    assert loaded == device


def test_copy_equality(device):
    other = device.copy()
    assert other == device
    other.layer.thickness *= 2
    assert other != device


def test_invalid_devices():
    layer = Layer(london_lambda=2, coherence_length=0.5, thickness=0.05)
    film = Polygon("film", points=box(4))
    with pytest.raises(ValueError):
        # duplicate hole names
        Device("bad", layer=layer, film=film,
               holes=[Polygon("h", points=circle(0.5)),
                      Polygon("h", points=circle(0.4, center=(1, 1)))])
    with pytest.raises(ValueError):
        # unnamed terminal
        Device("bad", layer=layer, film=film,
               terminals=[Polygon(points=box(1))])
    with pytest.raises(ValueError):
        # probe point outside film
        Device("bad", layer=layer, film=film, probe_points=[(100, 100)])


def test_plot(device):
    import matplotlib.pyplot as plt

    fig, ax = device.plot(mesh=True)
    plt.close(fig)
    ax2 = device.mesh.plot()
    plt.close(ax2.get_figure())


def test_thin_terminal_structured_mesh_raises():
    """A terminal polygon narrower than the lattice spacing fails loudly
    at MESH time on a structured lattice (the staircase boundary cannot
    reliably capture it), with an actionable message."""
    layer = Layer(london_lambda=2, coherence_length=1.0, thickness=0.1,
                  conductivity=10.0)
    film = Polygon("film", points=box(12, 5))
    # Lattice spacing at this density is ~0.7 um; a 0.05-um-wide terminal
    # cannot span a staircase step.
    source = Polygon("source", points=box(0.05, 5, center=(-6, 0)))
    drain = Polygon("drain", points=box(0.05, 5, center=(6, 0)))
    dev = Device("thin", layer=layer, film=film,
                 terminals=[source, drain], length_units="um")
    with pytest.raises(ValueError, match="lattice spacing"):
        dev.make_mesh(min_points=400, structured=True)


def test_overlapping_staircase_terminals_raise():
    """Two terminals that staircase onto the same boundary sites fail
    loudly at mesh time instead of silently sharing current sites."""
    layer = Layer(london_lambda=2, coherence_length=1.0, thickness=0.1,
                  conductivity=10.0)
    film = Polygon("film", points=box(12, 5))
    a = Polygon("a", points=box(1.5, 5, center=(-5.8, 0)))
    b = Polygon("b", points=box(1.5, 5, center=(-5.0, 0)))
    dev = Device("overlap", layer=layer, film=film,
                 terminals=[a, b], length_units="um")
    with pytest.raises(ValueError, match="overlap"):
        dev.make_mesh(min_points=400, structured=True)
