"""Tests for the small reference-parity API members added in round 4:
``Polygon.path`` / ``Polygon.polygon``, ``Device.patches``,
``Device.translate(dz=..., inplace=...)`` / ``Device.translation``, and
``Mesh.translate_in_place`` / ``Mesh.compute_voronoi_areas_polygons``."""

import numpy as np
import pytest

import tdgl_tpu as tdgl
from tdgl_tpu.geometry import box, circle


@pytest.fixture()
def holey_device():
    layer = tdgl.Layer(coherence_length=0.5, london_lambda=2, thickness=0.05)
    film = tdgl.Polygon("film", points=box(8)).resample(100)
    hole = tdgl.Polygon("hole", points=circle(1.0, center=(1, 1)))
    return tdgl.Device(
        "parity", layer=layer, film=film, holes=[hole],
        probe_points=[(-2, 0), (2, 0)], length_units="um",
    )


def test_polygon_path(holey_device):
    film = holey_device.film
    path = film.path
    # The Path agrees with the polygon's own containment test.
    assert path.contains_point((0.0, 0.0))
    assert not path.contains_point((10.0, 10.0))
    # No vertex is dropped: with closed=True matplotlib treats the LAST
    # vertex as the CLOSEPOLY placeholder, so the ring must arrive closed.
    # Probe points near every corner of a bare square (the regression case:
    # the unclosed ring rendered as a triangle).
    sq = tdgl.Polygon("sq", points=[[0, 0], [1, 0], [1, 1], [0, 1]])
    for probe in [(0.1, 0.1), (0.9, 0.1), (0.9, 0.9), (0.1, 0.9)]:
        assert sq.path.contains_point(probe), probe
    tri = tdgl.Polygon("tri", points=[[0, 0], [1, 0], [0.5, 1]])
    assert tri.path.contains_point((0.5, 0.4))


def test_polygon_polygon_requires_shapely(holey_device):
    try:
        import shapely  # noqa: F401

        poly = holey_device.film.polygon
        assert poly.area == pytest.approx(holey_device.film.area, rel=1e-9)
    except ImportError:
        with pytest.raises(ImportError, match="shapely"):
            holey_device.film.polygon


def test_device_patches(holey_device):
    from matplotlib.path import Path

    from tdgl_tpu.geometry import polygon_area

    patches = holey_device.patches
    # Holes are cut out of the film patch rather than listed themselves.
    assert set(patches) == {"film"}
    path = patches["film"].get_path()
    codes = np.asarray(path.codes)
    # Two rings: the film outline plus the hole as a sub-path. (matplotlib's
    # contains_point ignores sub-path orientation, so containment cannot be
    # asserted here; the nonzero fill rule used for RENDERING cuts the hole
    # because the sub-path runs opposite to the outer ring.)
    starts = np.where(codes == Path.MOVETO)[0]
    assert len(starts) == 2
    assert (codes == Path.CLOSEPOLY).sum() == 2
    outer = path.vertices[starts[0]:starts[1]]
    inner = path.vertices[starts[1]:]
    assert polygon_area(outer) > 0       # film ring CCW
    assert polygon_area(inner[:-1]) < 0  # hole ring CW (cut under nonzero)
    assert path.contains_point((0.0, 0.0))        # in film
    assert not path.contains_point((10.0, 10.0))  # outside
    # Every film corner survives (regression: CLOSEPOLY on a real vertex
    # dropped one corner from the rendered patch).
    for probe in [(-3.9, -3.9), (3.9, -3.9), (3.9, 3.9), (-3.9, 3.9)]:
        assert path.contains_point(probe), probe


def test_translate_copy_and_dz(holey_device):
    new = holey_device.translate(1.0, -2.0, dz=0.5)
    assert new is not holey_device
    np.testing.assert_allclose(
        new.film.points, holey_device.film.points + [1.0, -2.0]
    )
    assert new.layer.z0 == pytest.approx(holey_device.layer.z0 + 0.5)
    assert holey_device.layer.z0 == 0.0  # original untouched


def test_translate_inplace_moves_mesh(holey_device):
    device = holey_device
    device.make_mesh(min_points=500)
    sites0 = device.points.copy()
    areas0 = device.areas.copy()
    centers0 = device.mesh.edge_mesh.centers.copy()
    out = device.translate(2.0, 3.0, inplace=True)
    assert out is device
    np.testing.assert_allclose(device.points, sites0 + [2.0, 3.0],
                               atol=1e-12)
    # Isometry: areas unchanged exactly.
    np.testing.assert_array_equal(device.areas, areas0)
    xi = device.layer.coherence_length
    np.testing.assert_allclose(
        device.mesh.edge_mesh.centers, centers0 + np.array([2.0, 3.0]) / xi,
        atol=1e-12,
    )
    np.testing.assert_allclose(device.probe_points, [(0, 3), (4, 3)])


def test_translation_context_manager(holey_device):
    device = holey_device
    device.make_mesh(min_points=500)
    pts0 = device.points.copy()
    film0 = device.film.points.copy()
    with device.translation(5.0, -1.0, dz=2.0):
        np.testing.assert_allclose(device.points, pts0 + [5.0, -1.0],
                                   atol=1e-12)
        assert device.layer.z0 == pytest.approx(2.0)
    np.testing.assert_allclose(device.points, pts0, atol=1e-9)
    np.testing.assert_allclose(device.film.points, film0, atol=1e-9)
    assert device.layer.z0 == pytest.approx(0.0)


def test_translation_restores_on_error(holey_device):
    device = holey_device
    film0 = device.film.points.copy()
    with pytest.raises(RuntimeError):
        with device.translation(1.0, 1.0):
            raise RuntimeError("boom")
    np.testing.assert_allclose(device.film.points, film0, atol=1e-9)


def test_translated_structured_mesh_grid_origin(holey_device):
    device = holey_device
    device.make_mesh(min_points=2000, structured=True)
    origin0 = device.mesh.grid.origin
    xi = device.layer.coherence_length
    device.translate(1.0, 0.5, inplace=True)
    assert device.mesh.grid.origin[0] == pytest.approx(
        origin0[0] + 1.0 / xi
    )
    assert device.mesh.grid.origin[1] == pytest.approx(
        origin0[1] + 0.5 / xi
    )


def test_compute_voronoi_areas_polygons(holey_device):
    device = holey_device
    device.make_mesh(min_points=500)
    mesh = device.mesh
    areas, polygons = mesh.compute_voronoi_areas_polygons(
        mesh.sites, mesh.elements, mesh.dual_sites, mesh.edge_mesh,
        mesh.boundary_indices,
    )
    np.testing.assert_allclose(areas, mesh.areas)
    assert len(polygons) == len(mesh.sites)
    # Cell vertex arrays are CCW-oriented 2D rings.
    from tdgl_tpu.geometry import polygon_area

    assert all(p.shape[1] == 2 and polygon_area(p) > 0 for p in polygons)
