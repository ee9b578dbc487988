"""Native C++ host-kernel tests: parity with the numpy fallbacks."""

import numpy as np
import pytest

from neupan_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (sh native/build.sh)")


def test_scan_to_points_matches_numpy_reference():
    from neupan_tpu.utils import get_transform

    rng = np.random.default_rng(0)
    n = 100
    ranges = rng.uniform(0.5, 10.0, n)
    velocity = rng.normal(size=(2, n))
    state = np.array([[1.0], [2.0], [0.7]])
    offset = (0.1, -0.2, 0.3)

    native_pts, native_vels = native.scan_to_points(
        ranges, -np.pi, np.pi, 0.1, 10.0, (-np.pi, np.pi), 2,
        offset, state, velocity=velocity, offset_inverse=True,
        min_inclusive=True)

    # numpy reference (mirrors the planner's fallback math)
    angles = np.linspace(-np.pi, np.pi, n)
    keep = (ranges < 10.0 - 0.02) & (ranges >= 0.1) & \
           (angles > -np.pi) & (angles < np.pi)
    r, a = ranges[keep], angles[keep]
    pa = np.vstack([r * np.cos(a), r * np.sin(a)])
    s_t, s_R = get_transform(np.c_[list(offset)])
    temp = s_R.T @ (pa - s_t)
    t, R = get_transform(state)
    np_pts = (R @ temp + t)[:, ::2]
    np_vels = velocity[:, keep][:, ::2]

    np.testing.assert_allclose(native_pts, np_pts, atol=1e-12)
    np.testing.assert_allclose(native_vels, np_vels, atol=1e-12)


def test_raycast_known_wall():
    segs = np.array([[[4.9, -5.0], [4.9, 5.0]]])  # vertical wall at x=4.9
    ranges, hits = native.raycast((0.0, 0.0), 0.0, -np.pi / 4, np.pi / 4,
                                  9, 0.0, 10.0, segs)
    mid = 4
    assert np.isclose(ranges[mid], 4.9, atol=1e-9)
    assert hits[mid] == 0
    # oblique beam: r = 4.9 / cos(angle)
    assert np.isclose(ranges[0], 4.9 / np.cos(np.pi / 4), atol=1e-9)


def test_raycast_miss_gives_range_max():
    segs = np.array([[[100.0, -1.0], [100.0, 1.0]]])
    ranges, hits = native.raycast((0.0, 0.0), 0.0, -0.1, 0.1, 3, 0.0, 10.0,
                                  segs)
    assert np.allclose(ranges, 10.0)
    assert np.all(hits == -1)


def test_closest_point_index_matches_reference_semantics():
    xs = np.linspace(0, 10, 101)
    path = np.vstack([xs, np.zeros_like(xs)])
    # state near x=3.33; window [30, 40)
    idx = native.closest_point_index(path, (3.33, 0.1), 30, 10, 0.001)
    assert idx == 33
    # early-break threshold: picks the first point within the threshold
    idx2 = native.closest_point_index(path, (3.33, 0.0), 30, 10, 0.2)
    assert idx2 in (32, 33)
