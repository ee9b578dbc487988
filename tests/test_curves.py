"""Curve generator tests: line, Dubins, Reeds-Shepp endpoint accuracy."""

import numpy as np
import pytest

from neupan_tpu.ipath.curves import generate_curve
from neupan_tpu.ipath.reeds_shepp import reeds_shepp_path, shortest_rs_word


def _angdiff(a, b):
    return abs(((a - b) + np.pi) % (2 * np.pi) - np.pi)


def test_line_curve_spacing_and_heading():
    path = generate_curve("line", [[0, 0, 0], [10, 0, 0]], 0.4)
    pts = np.hstack([p[0:2] for p in path])
    gaps = np.linalg.norm(np.diff(pts, axis=1), axis=0)
    assert np.all(gaps <= 0.41)
    assert np.allclose([p[2, 0] for p in path], 0.0)
    assert np.allclose(path[0][0:2].ravel(), [0, 0])
    assert np.allclose(path[-1][0:2].ravel(), [10, 0])
    # gear is forward everywhere
    assert all(p[3, 0] == 1 for p in path)


def test_line_curve_multiple_waypoints():
    path = generate_curve("line", [[0, 0, 0], [5, 0, 0], [5, 5, 0]], 0.5)
    # heading switches from 0 to pi/2 partway
    headings = [p[2, 0] for p in path]
    assert any(abs(h) < 1e-6 for h in headings)
    assert any(abs(h - np.pi / 2) < 1e-6 for h in headings)


@pytest.mark.parametrize("seed", range(5))
def test_dubins_reaches_goal(seed):
    rng = np.random.default_rng(seed)
    a = np.array([0.0, 0.0, rng.uniform(-np.pi, np.pi)])
    b = rng.uniform(-8, 8, 3)
    b[2] = rng.uniform(-np.pi, np.pi)
    path = generate_curve("dubins", [a, b], 0.1, 1.0)
    end = path[-1]
    assert np.hypot(end[0, 0] - b[0], end[1, 0] - b[1]) < 1e-3
    assert _angdiff(end[2, 0], b[2]) < 1e-3


@pytest.mark.parametrize("seed", range(8))
def test_reeds_shepp_reaches_goal(seed):
    rng = np.random.default_rng(seed + 100)
    start = np.array([0.0, 0.0, rng.uniform(-np.pi, np.pi)])
    goal = rng.uniform(-5, 5, 3)
    goal[2] = rng.uniform(-np.pi, np.pi)
    path = reeds_shepp_path(start, goal, 1.0, 0.1)
    end = np.array(path[-1][:3])
    assert np.hypot(end[0] - goal[0], end[1] - goal[1]) < 1e-4
    assert _angdiff(end[2], goal[2]) < 1e-4


def test_reeds_shepp_reverse_gear():
    # goal directly behind: must use reverse gear
    path = reeds_shepp_path([0, 0, 0], [-2, 0, 0], 1.0, 0.1)
    gears = {g for *_, g in path}
    assert -1.0 in gears


def test_reeds_word_optimality_straight():
    # straight-ahead goal: shortest word is a pure straight segment
    w = shortest_rs_word([0, 0, 0], [5, 0, 0], 1.0)
    total = sum(abs(l) for l in w.lengths)
    assert abs(total - 5.0) < 1e-6


def test_generate_curve_gear_column():
    path = generate_curve("reeds", [[0, 0, 0], [-3, 1, 0]], 0.1, 1.0)
    assert all(p.shape == (4, 1) for p in path)
