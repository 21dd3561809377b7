import numpy as np
import pytest

from tdgl_tpu.geometry import (
    box,
    circle,
    close_curve,
    distance_to_polygon,
    ellipse,
    ensure_unique,
    path_vectors,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
    rotate,
)


def test_box_dimensions():
    coords = box(4, 2, points=120)
    assert coords.shape[1] == 2
    assert np.isclose(coords[:, 0].max(), 2)
    assert np.isclose(coords[:, 1].max(), 1)
    # CCW orientation
    assert polygon_area(ensure_unique(coords)) > 0


def test_circle_radius():
    coords = circle(3.0, points=200, center=(1, -1))
    r = np.linalg.norm(coords - [1, -1], axis=1)
    assert np.allclose(r, 3.0)


def test_ellipse_area():
    coords = ellipse(2, 1, points=4000)
    assert np.isclose(polygon_area(coords), 2 * np.pi, rtol=1e-4)


def test_rotate():
    coords = np.array([[1.0, 0.0]])
    out = rotate(coords, 90)
    assert np.allclose(out, [[0, 1]], atol=1e-12)


def test_close_curve():
    open_curve = np.array([[0, 0], [1, 0], [1, 1]])
    closed = close_curve(open_curve)
    assert np.allclose(closed[0], closed[-1])
    assert close_curve(closed).shape == closed.shape


def test_path_vectors():
    path = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 2.0]])
    lengths, normals = path_vectors(path)
    assert np.allclose(lengths, [1, 2])
    assert np.allclose(np.linalg.norm(normals, axis=1), 1)
    # Normal to +x segment points in -y (right-hand side)
    assert np.allclose(normals[0], [0, -1])


def test_points_in_polygon():
    square = box(2, 2, points=40)
    pts = np.array([[0, 0], [0.9, 0.9], [1.5, 0], [-3, 0]])
    inside = points_in_polygon(pts, square)
    assert inside.tolist() == [True, True, False, False]


def test_points_in_polygon_radius():
    square = box(2, 2, points=40)
    pts = np.array([[1.05, 0.0]])
    assert not points_in_polygon(pts, square)[0]
    assert points_in_polygon(pts, square, radius=0.1)[0]
    near_inside = np.array([[0.95, 0.0]])
    assert points_in_polygon(near_inside, square)[0]
    assert not points_in_polygon(near_inside, square, radius=-0.1)[0]


def test_distance_to_polygon():
    square = box(2, 2, points=40)
    d = distance_to_polygon(np.array([[0.0, 0.0], [2.0, 0.0]]), square)
    assert np.allclose(d, [1.0, 1.0])


def test_centroid():
    square = box(2, 2, points=40, center=(3, 4))
    c = polygon_centroid(ensure_unique(square))
    assert np.allclose(c, [3, 4], atol=1e-9)


def test_polygon_make_mesh():
    """Polygon.make_mesh returns a valid FV mesh of the polygon alone
    (reference ``tdgl/device/polygon.py:459-511``)."""
    import tdgl_tpu as tdgl

    notch = box(1.5, 1.5, center=(2.0, 0.0))  # overlaps the right edge
    poly = tdgl.Polygon("notched", points=box(4, 4)).difference(notch)
    mesh = poly.make_mesh(min_points=600, smooth=10)
    assert len(mesh.sites) >= 600
    # all sites inside (or on) the outer square, none deep inside the notch
    assert np.all(np.abs(mesh.sites) <= 2 + 1e-9)
    in_notch = (np.abs(mesh.sites[:, 1]) < 0.6) & (mesh.sites[:, 0] > 1.4)
    assert not in_notch.any()
    # positive Voronoi areas and consistent triangulation
    assert np.all(mesh.areas > 0)
    assert mesh.elements.min() >= 0 and mesh.elements.max() < len(mesh.sites)
