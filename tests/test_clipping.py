"""Acceptance tests for the from-scratch polygon boolean engine.

The reference delegates polygon booleans to shapely/GEOS
(``/root/reference/tdgl/device/polygon.py:282-401``); this repo implements
Greiner-Hormann clipping from scratch (``tdgl_tpu/device/clipping.py``), so
the boolean ops get their own acceptance suite:

- exact-area cases (overlapping / disjoint / contained / edge-sharing boxes,
  including collinear-overlap degeneracies that exercise the perturbation
  fallback),
- randomized invariant fuzzing over convex and star-shaped simple polygons,
  checking the inclusion-exclusion area identity and point-membership
  agreement with the independent ray-casting oracle
  (``geometry.points_in_polygon``).
"""

import numpy as np
import pytest

from tdgl_tpu.device.clipping import clip_polygons
from tdgl_tpu.geometry import (
    box,
    distance_to_polygon,
    points_in_polygon,
    polygon_area,
)


def _area(polys):
    return sum(abs(polygon_area(p)) for p in polys)


def _membership(polys, pts):
    inside = np.zeros(len(pts), dtype=bool)
    for p in polys:
        inside |= points_in_polygon(pts, p)
    return inside


def _min_distance(pts, polys):
    d = np.full(len(pts), np.inf)
    for p in polys:
        d = np.minimum(d, distance_to_polygon(pts, p))
    return d


# ---------------------------------------------------------------------------
# Exact cases


def _corners(w, h, center):
    cx, cy = center
    return np.array([
        [cx - w / 2, cy - h / 2], [cx + w / 2, cy - h / 2],
        [cx + w / 2, cy + h / 2], [cx - w / 2, cy + h / 2],
    ])


def test_overlapping_boxes_exact_areas():
    # [-1,1]^2 and [0,2]x[-0.5,1.5] as bare 4-corner rings: plain
    # transversal crossings, no coincident vertices (geometry.box()
    # resamples its edges, which puts sample vertices exactly on the other
    # polygon's boundary — a legitimate degeneracy tested separately).
    A = _corners(2, 2, (0, 0))
    B = _corners(2, 2, (1, 0.5))
    union = clip_polygons(A, B, "union")
    inter = clip_polygons(A, B, "intersection")
    diff = clip_polygons(A, B, "difference")
    assert len(union) == 1 and len(inter) == 1 and len(diff) == 1
    assert _area(inter) == pytest.approx(1.5, rel=1e-9)
    assert _area(union) == pytest.approx(6.5, rel=1e-9)
    assert _area(diff) == pytest.approx(2.5, rel=1e-9)


def test_collinear_overlap_boxes():
    # [-1,1]^2 and [0,2]x[-1,1]: the shared segments along y = +-1 are
    # collinear overlaps -> the deterministic perturbation fallback.
    A = box(2, center=(0, 0))
    B = box(2, center=(1, 0))
    assert _area(clip_polygons(A, B, "union")) == pytest.approx(6.0, rel=1e-5)
    assert _area(clip_polygons(A, B, "intersection")) == pytest.approx(
        2.0, rel=1e-5
    )
    assert _area(clip_polygons(A, B, "difference")) == pytest.approx(
        2.0, rel=1e-5
    )


def test_edge_sharing_boxes():
    # Two unit squares sharing a full edge: touching, zero-area overlap.
    A = box(1, center=(-0.5, 0))
    B = box(1, center=(0.5, 0))
    union = clip_polygons(A, B, "union")
    assert len(union) == 1
    assert _area(union) == pytest.approx(2.0, rel=1e-4)


def test_disjoint_boxes():
    A = box(1, center=(0, 0))
    B = box(1, center=(5, 0))
    union = clip_polygons(A, B, "union")
    assert len(union) == 2
    assert _area(union) == pytest.approx(2.0, rel=1e-12)
    assert clip_polygons(A, B, "intersection") == []
    diff = clip_polygons(A, B, "difference")
    assert len(diff) == 1
    assert _area(diff) == pytest.approx(1.0, rel=1e-12)


def test_contained_box_semantics():
    A = box(4, center=(0, 0))
    B = box(1, center=(0.2, -0.3))  # strictly inside A
    union = clip_polygons(A, B, "union")
    assert len(union) == 1 and _area(union) == pytest.approx(16.0)
    inter = clip_polygons(A, B, "intersection")
    assert len(inter) == 1 and _area(inter) == pytest.approx(1.0)
    # A - B would be an annulus (a polygon with a hole): must refuse loudly,
    # matching the reference's single-simple-ring Polygon model.
    with pytest.raises(ValueError):
        clip_polygons(A, B, "difference")
    # B - A is empty.
    assert clip_polygons(B, A, "difference") == []


def test_orientation_of_results_is_ccw():
    A = box(2, center=(0, 0))
    B = box(2, center=(1, 0.5))
    for op in ("union", "intersection", "difference"):
        for poly in clip_polygons(A, B, op):
            assert polygon_area(poly) > 0.0


def test_input_orientation_invariance():
    # CW inputs must produce the same result as CCW inputs.
    A = _corners(2, 2, (0, 0))
    B = _corners(2, 2, (1, 0.5))
    a1 = _area(clip_polygons(A, B, "intersection"))
    a2 = _area(clip_polygons(A[::-1], B[::-1], "intersection"))
    assert a1 == pytest.approx(a2, rel=1e-12)


# ---------------------------------------------------------------------------
# Randomized invariants


def _random_convex(rng, center, scale, n_cloud=30):
    from scipy.spatial import ConvexHull

    pts = rng.normal(size=(n_cloud, 2))
    hull = ConvexHull(pts)
    return pts[hull.vertices] * scale + np.asarray(center)


def _random_star(rng, center, scale, n=24):
    """Mildly star-shaped simple polygon: r(theta) in [0.6, 1.4]*scale."""
    theta = np.sort(rng.uniform(0, 2 * np.pi, n))
    # Guarantee distinct angles (duplicate angles make degenerate edges).
    theta += np.arange(n) * 1e-9
    r = rng.uniform(0.6, 1.4, n) * scale
    return np.c_[
        center[0] + r * np.cos(theta), center[1] + r * np.sin(theta)
    ]


def _check_invariants(rng, A, B):
    aA = abs(polygon_area(A))
    aB = abs(polygon_area(B))
    inter = clip_polygons(A, B, "intersection")
    union = clip_polygons(A, B, "union")
    aI = _area(inter)
    aU = _area(union)
    # Inclusion-exclusion: |A u B| + |A n B| = |A| + |B|.
    assert abs(aU + aI - aA - aB) < 1e-6 * (aA + aB)
    try:
        diff = clip_polygons(A, B, "difference")
        aD = _area(diff)
        assert abs(aD - (aA - aI)) < 1e-6 * max(aA, aB)
    except ValueError:
        # Legitimate refusal: B strictly inside A -> hole. Then the
        # intersection must be (essentially) all of B.
        diff = None
        assert aI == pytest.approx(aB, rel=1e-6)

    # Point-membership agreement with the ray-casting oracle, away from
    # boundaries (the perturbation fallback may move results by ~1e-9).
    span = max(np.ptp(np.r_[A, B][:, 0]), np.ptp(np.r_[A, B][:, 1]))
    lo = np.r_[A, B].min(axis=0) - 0.25 * span
    hi = np.r_[A, B].max(axis=0) + 0.25 * span
    pts = rng.uniform(lo, hi, size=(400, 2))
    margin = 1e-4 * span
    mask = (distance_to_polygon(pts, A) > margin) & (
        distance_to_polygon(pts, B) > margin
    )
    inA = points_in_polygon(pts, A)
    inB = points_in_polygon(pts, B)
    np.testing.assert_array_equal(
        _membership(union, pts)[mask], (inA | inB)[mask]
    )
    np.testing.assert_array_equal(
        _membership(inter, pts)[mask], (inA & inB)[mask]
    )
    if diff is not None:
        np.testing.assert_array_equal(
            _membership(diff, pts)[mask], (inA & ~inB)[mask]
        )


@pytest.mark.parametrize("seed", range(20))
def test_convex_fuzz_invariants(seed):
    rng = np.random.default_rng(seed)
    A = _random_convex(rng, (0.0, 0.0), 1.0)
    B = _random_convex(
        rng, rng.uniform(-0.8, 0.8, size=2), rng.uniform(0.4, 1.2)
    )
    _check_invariants(rng, A, B)


@pytest.mark.parametrize("seed", range(100, 120))
def test_star_fuzz_invariants(seed):
    rng = np.random.default_rng(seed)
    A = _random_star(rng, (0.0, 0.0), 1.0)
    B = _random_star(rng, rng.uniform(-0.5, 0.5, size=2),
                     rng.uniform(0.5, 1.1))
    _check_invariants(rng, A, B)
