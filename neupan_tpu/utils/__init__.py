"""Host-side utility helpers for neupan_tpu.

Covers the capability surface of the reference's ``neupan/util/__init__.py``
(reference: util/__init__.py:29-306): timing, file resolution, angle wrapping,
rigid transforms, convex-polygon half-space generation, and decimation
down-sampling.  Everything here is plain numpy / Python — these helpers run on
the host, outside the jitted TPU compute path.
"""

from __future__ import annotations

import functools
import os
import sys
import time
from contextlib import contextmanager
from math import atan2, cos, pi, sin, sqrt
from typing import Callable, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# timing (parity with util/__init__.py:29-55 `time_it`)
# ---------------------------------------------------------------------------

# Process-global switch, mirrored by the planner's `time_print` YAML knob.
TIME_PRINT = False


def set_time_print(flag: bool) -> None:
    global TIME_PRINT
    TIME_PRINT = bool(flag)


def time_it(name: str = "Function") -> Callable:
    """Decorator printing wall-clock duration per call when TIME_PRINT is on."""

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            wrapper.count += 1
            start = time.perf_counter()
            result = func(*args, **kwargs)
            elapsed = time.perf_counter() - start
            if TIME_PRINT:
                print(f"{name} execute time {elapsed:.6f} seconds")
            return result

        wrapper.count = 0
        return wrapper

    return decorator


# ---------------------------------------------------------------------------
# file resolution (parity with util/__init__.py:58-94 `file_check`)
# ---------------------------------------------------------------------------

def file_check(file_name: Optional[str], root_path: Optional[str] = None) -> Optional[str]:
    """Resolve ``file_name`` against cwd, sys.path[0] and the package root.

    Returns the absolute path, or raises FileNotFoundError.
    """
    if file_name is None:
        return None

    if root_path is None:
        import neupan_tpu

        root_path = os.path.dirname(os.path.dirname(os.path.abspath(neupan_tpu.__file__)))

    candidates = [
        file_name,
        os.path.join(sys.path[0], file_name) if sys.path and sys.path[0] else None,
        os.path.join(os.getcwd(), file_name),
        os.path.join(root_path, file_name),
    ]
    for cand in candidates:
        if cand is not None and os.path.exists(cand):
            return os.path.abspath(cand)

    raise FileNotFoundError(f"File not found: {file_name}")


def repeat_mk_dirs(path: str, max_num: int = 100) -> str:
    """Create a directory, appending _1.._N suffixes on collision."""
    if not os.path.exists(path):
        os.makedirs(path)
        return path
    if len(os.listdir(path)) == 0:
        return path
    i = 1
    new_path = path
    while i < max_num:
        new_path = f"{path}_{i}"
        if not os.path.exists(new_path):
            break
        i += 1
    os.makedirs(new_path)
    return new_path


# ---------------------------------------------------------------------------
# geometry (parity with util/__init__.py:98-254)
# ---------------------------------------------------------------------------

def wrap_to_pi(rad: float, positive: bool = False) -> float:
    """Wrap an angle to [-pi, pi] (boundary values keep their sign)."""
    wrapped = (rad + pi) % (2 * pi) - pi
    if wrapped == -pi and rad > 0:
        wrapped = pi
    return abs(wrapped) if positive else wrapped


# Reference-compatible alias.
WrapToPi = wrap_to_pi


def distance(point1: np.ndarray, point2: np.ndarray) -> float:
    """Euclidean distance between two (2,1) column points."""
    return sqrt(
        (point1[0, 0] - point2[0, 0]) ** 2 + (point1[1, 0] - point2[1, 0]) ** 2
    )


def get_transform(state: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """State [x, y, theta] (3,1) -> (translation (2,1), rotation (2,2)).

    A (2,1) state yields the identity rotation (reference util:136-157).
    """
    if state.shape == (2, 1):
        return state[0:2], np.eye(2)
    theta = state[2, 0]
    rot = np.array([[cos(theta), -sin(theta)], [sin(theta), cos(theta)]])
    return state[0:2], rot


def cross_product(o, a, b) -> float:
    """Cross product of vectors OA x OB (z component)."""
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def is_convex_and_ordered(points: np.ndarray) -> Tuple[bool, Optional[str]]:
    """Check convexity of a 2xN polygon and report winding ('CW'/'CCW')."""
    n = points.shape[1]
    if n < 3:
        return False, None

    direction = 0
    for i in range(n):
        o = points[:, i]
        a = points[:, (i + 1) % n]
        b = points[:, (i + 2) % n]
        cross = cross_product(o, a, b)
        if cross != 0:
            if direction == 0:
                direction = 1 if cross > 0 else -1
            elif (cross > 0) != (direction > 0):
                return False, None

    return True, "CCW" if direction > 0 else "CW"


def gen_inequal_from_vertex(vertex: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Convex polygon (2,N) -> half-space description G x <= h.

    Vertices may be CW or CCW; CW input is re-ordered to CCW keeping the first
    vertex fixed (matches reference util:161-206).  Raises on non-convex input.
    """
    convex, order = is_convex_and_ordered(vertex)
    if not convex:
        raise ValueError("The polygon constructed by vertex is not convex.")

    if order == "CW":
        vertex = np.hstack([vertex[:, 0:1], vertex[:, 1:][:, ::-1]])

    num = vertex.shape[1]
    G = np.zeros((num, 2))
    h = np.zeros((num, 1))
    for i in range(num):
        pre = vertex[:, i]
        nxt = vertex[:, (i + 1) % num]
        diff = nxt - pre
        a, b = diff[1], -diff[0]
        G[i, 0] = a
        G[i, 1] = b
        h[i, 0] = a * pre[0] + b * pre[1]
    return G, h


def downsample_decimation(mat: np.ndarray, m: int) -> np.ndarray:
    """Uniformly subsample a (dim, n) matrix to (dim, m) columns (m < n)."""
    n = mat.shape[1]
    if m >= n:
        return mat
    indices = np.linspace(0, n - 1, m).astype(int)
    return mat[:, indices]


@contextmanager
def profile_trace(log_dir: str = "/tmp/neupan_trace"):
    """Capture a jax.profiler trace of the enclosed block (view in
    TensorBoard / Perfetto).  The TPU-native analogue of the reference's
    time_print wall-clock printing (reference: util/__init__.py:29-55) for
    per-kernel analysis.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
