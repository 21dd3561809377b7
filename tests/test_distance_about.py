"""cdist and introspection tests, mirroring the reference's
``test_distance.py`` and ``test_about.py``."""

import numpy as np
from scipy.spatial import distance as sp_distance

from tdgl_tpu.about import version_dict, version_table
from tdgl_tpu.distance import cdist


def test_cdist_matches_scipy_2d():
    rng = np.random.default_rng(0)
    XA = rng.normal(size=(137, 2))
    XB = rng.normal(size=(211, 2))
    for metric in ("euclidean", "sqeuclidean"):
        got = cdist(XA, XB, metric=metric)
        expected = sp_distance.cdist(XA, XB, metric=metric)
        np.testing.assert_allclose(got, expected, atol=1e-12)


def test_cdist_matches_scipy_3d():
    rng = np.random.default_rng(1)
    XA = rng.normal(size=(53, 3))
    XB = rng.normal(size=(71, 3))
    got = cdist(XA, XB)
    expected = sp_distance.cdist(XA, XB)
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_cdist_chunked():
    rng = np.random.default_rng(2)
    XA = rng.normal(size=(500, 2))
    XB = rng.normal(size=(400, 2))
    got = cdist(XA, XB, chunk_elements=1000)  # force many chunks
    expected = sp_distance.cdist(XA, XB)
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_cdist_validation():
    import pytest

    with pytest.raises(ValueError):
        cdist(np.zeros((3, 2)), np.zeros((3, 3)))
    with pytest.raises(ValueError):
        cdist(np.zeros((3, 4)), np.zeros((3, 4)))
    with pytest.raises(ValueError):
        cdist(np.zeros((3, 2)), np.zeros((3, 2)), metric="cityblock")


def test_version_dict():
    info = version_dict()
    assert "tdgl_tpu" in info
    assert "jax" in info
    assert "numpy" in info


def test_version_table():
    html = version_table()
    text = getattr(html, "data", html)
    assert "<table>" in text
    assert "tdgl_tpu" in text
