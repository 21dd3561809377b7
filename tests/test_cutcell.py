"""Cut-cell boundary-correction geometry invariants (device/cutcell.py).

Fast host-side checks; the end-to-end physics gate is
tests/test_solve.py::test_screening_structured_cut_cells.
"""

import numpy as np
import pytest

import tdgl_tpu as tdgl
from tdgl_tpu.geometry import box, circle, polygon_area


@pytest.fixture(scope="module")
def meshed(request):
    def make(cut):
        layer = tdgl.Layer(coherence_length=1.0, london_lambda=1.0,
                           thickness=0.1)
        film = tdgl.Polygon("film", points=box(10)).resample(401)
        hole = tdgl.Polygon("hole", points=circle(1.5, center=(2, 2)))
        device = tdgl.Device("cc", layer=layer, film=film, holes=[hole])
        device.make_mesh(min_points=2000, structured=True, cut_cells=cut)
        return device

    return make


def test_areas_tile_the_polygon(meshed):
    """Cut-cell Voronoi areas tile the film polygon (minus holes); the raw
    staircase under-covers by several percent."""
    device = meshed(True)
    film_area = abs(polygon_area(np.asarray(device.film.points)))
    hole_area = abs(polygon_area(np.asarray(device.holes[0].points)))
    target = film_area - hole_area
    ratio = device.mesh.areas.sum() / target
    # Exact on straight boundary sections; the curved hole loses only the
    # O(h^3/R) tangent-hull slivers.
    assert 0.99 <= ratio <= 1.0001

    stair = meshed(False)
    stair_ratio = stair.mesh.areas.sum() / target
    assert stair_ratio < ratio - 0.02  # the correction is load-bearing


def test_box_tiling_is_exact():
    """On a pure box (straight boundaries only) the cut-cell areas tile the
    polygon to float accuracy."""
    layer = tdgl.Layer(coherence_length=1.0, london_lambda=1.0,
                       thickness=0.1)
    film = tdgl.Polygon("film", points=box(12)).resample(301)
    device = tdgl.Device("bx", layer=layer, film=film)
    device.make_mesh(min_points=1500, structured=True)
    target = abs(polygon_area(np.asarray(film.points)))
    assert abs(device.mesh.areas.sum() / target - 1.0) < 1e-6


def test_interior_cells_untouched(meshed):
    """Interior sites keep the exact lattice hexagon area and dual length."""
    device = meshed(True)
    mesh = device.mesh
    h = mesh.grid.spacing
    hex_area = np.sqrt(3) / 2 * h * h
    dual = h / np.sqrt(3)
    # Sites far from any boundary: distance to film edge and hole > 2h.
    from tdgl_tpu.geometry import distance_to_polygon

    d_film = distance_to_polygon(mesh.sites, np.asarray(device.film.points))
    d_hole = distance_to_polygon(mesh.sites,
                                 np.asarray(device.holes[0].points))
    interior = (np.abs(d_film) > 2 * h) & (np.abs(d_hole) > 2 * h)
    assert interior.sum() > 100
    np.testing.assert_allclose(mesh.areas[interior], hex_area, rtol=1e-6)
    edges = mesh.edge_mesh.edges
    e_int = interior[edges[:, 0]] & interior[edges[:, 1]]
    np.testing.assert_allclose(
        mesh.edge_mesh.dual_edge_lengths[e_int], dual, rtol=1e-6
    )


def test_no_negative_weights(meshed):
    device = meshed(True)
    assert (device.mesh.areas > 0).all()
    assert (device.mesh.edge_mesh.dual_edge_lengths >= 0).all()
