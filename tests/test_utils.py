"""Tests for host-side utility helpers (geometry, transforms, decimation)."""

import numpy as np
import pytest

from neupan_tpu.utils import (
    downsample_decimation,
    gen_inequal_from_vertex,
    get_transform,
    is_convex_and_ordered,
    wrap_to_pi,
)


def test_wrap_to_pi():
    assert wrap_to_pi(0.0) == 0.0
    assert np.isclose(wrap_to_pi(np.pi + 0.1), -np.pi + 0.1)
    assert np.isclose(wrap_to_pi(-np.pi - 0.1), np.pi - 0.1)
    assert np.isclose(wrap_to_pi(5 * np.pi), np.pi)
    assert np.isclose(wrap_to_pi(-3.0, positive=True), 3.0)


def test_get_transform():
    state = np.array([[1.0], [2.0], [np.pi / 2]])
    trans, rot = get_transform(state)
    assert np.allclose(trans, [[1.0], [2.0]])
    assert np.allclose(rot, [[0.0, -1.0], [1.0, 0.0]], atol=1e-12)
    # 2x1 state -> identity rotation
    trans2, rot2 = get_transform(np.array([[3.0], [4.0]]))
    assert np.allclose(rot2, np.eye(2))


def test_convexity_and_order():
    ccw = np.array([[0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]])
    cw = ccw[:, ::-1]
    assert is_convex_and_ordered(ccw) == (True, "CCW")
    assert is_convex_and_ordered(cw) == (True, "CW")
    nonconvex = np.array([[0.0, 2.0, 1.0, 2.0, 0.0], [0.0, 0.0, 1.0, 2.0, 2.0]])
    assert is_convex_and_ordered(nonconvex)[0] is False


def test_gen_inequal_unit_square():
    # CCW unit square centred at origin
    verts = np.array([[-1.0, 1.0, 1.0, -1.0], [-1.0, -1.0, 1.0, 1.0]])
    G, h = gen_inequal_from_vertex(verts)
    # all vertices satisfy Gx <= h with equality on two rows each
    vals = G @ verts - h
    assert np.all(vals <= 1e-12)
    # interior point strictly inside
    assert np.all(G @ np.array([[0.0], [0.0]]) - h < 0)
    # exterior point violates at least one row
    assert np.any(G @ np.array([[2.0], [0.0]]) - h > 0)


def test_gen_inequal_cw_input_flipped():
    verts_ccw = np.array([[-1.0, 1.0, 1.0, -1.0], [-1.0, -1.0, 1.0, 1.0]])
    verts_cw = np.hstack([verts_ccw[:, 0:1], verts_ccw[:, 1:][:, ::-1]])
    G1, h1 = gen_inequal_from_vertex(verts_ccw)
    G2, h2 = gen_inequal_from_vertex(verts_cw)
    # same half-space set (row order may differ); compare via sorted rows
    s1 = np.array(sorted(np.hstack([G1, h1]).tolist()))
    s2 = np.array(sorted(np.hstack([G2, h2]).tolist()))
    assert np.allclose(s1, s2)


def test_gen_inequal_nonconvex_raises():
    nonconvex = np.array([[0.0, 2.0, 1.0, 2.0, 0.0], [0.0, 0.0, 1.0, 2.0, 2.0]])
    with pytest.raises(ValueError):
        gen_inequal_from_vertex(nonconvex)


def test_downsample_decimation():
    mat = np.arange(20).reshape(2, 10).astype(float)
    out = downsample_decimation(mat, 4)
    assert out.shape == (2, 4)
    assert np.allclose(out[:, 0], mat[:, 0])
    assert np.allclose(out[:, -1], mat[:, -1])
    # m >= n returns input unchanged
    assert downsample_decimation(mat, 20) is mat
