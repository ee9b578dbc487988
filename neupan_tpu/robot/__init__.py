"""Robot geometry and kinematics for neupan_tpu.

TPU-first re-design of the reference robot model (reference: robot/robot.py,
blocks/initial_path.py:388-444).  Instead of building cvxpy expressions, this
module exposes:

* ``Robot`` — a frozen, hashable config object: convex geometry (G, h),
  kinematics tag, bounds.  Suitable as a jit static argument.
* exact step functions (``step``) and their closed-form per-step
  linearizations (``linearize``) as pure, vmappable jnp code — these feed the
  NRMP QP assembly with fixed shapes and no Python loops over the horizon.

Kinematics supported (parity with robot.py:272-316):
  - ``diff``:  state [x, y, phi], control [v, w]
  - ``acker``: state [x, y, phi], control [v, steer psi], wheelbase L
  - ``omni``:  state [x, y, phi], control [speed, orientation]
"""

from __future__ import annotations

import dataclasses
from math import inf
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from neupan_tpu.utils import gen_inequal_from_vertex

KINEMATICS = ("diff", "acker", "omni")


def rectangle_vertices(length: float, width: float, wheelbase: Optional[float] = None) -> np.ndarray:
    """Rectangle footprint vertices (2,4), CCW, origin offset by wheelbase/2.

    Matches reference robot.py:318-340: the rectangle is centred laterally and
    shifted so the kinematic origin sits ``wheelbase/2`` behind the geometric
    centre (rear-axle convention for car-like robots).
    """
    wb = 0.0 if wheelbase is None else wheelbase
    sx = -(length - wb) / 2.0
    sy = -width / 2.0
    return np.array(
        [
            [sx, sx + length, sx + length, sx],
            [sy, sy, sy + width, sy + width],
        ]
    )


def _as_bound(value, default=inf) -> np.ndarray:
    if value is None:
        return np.full((2, 1), default, dtype=np.float64)
    arr = np.array(value, dtype=np.float64).reshape(2, 1)
    return arr


@dataclasses.dataclass(frozen=True)
class Robot:
    """Frozen robot description.

    Hashable (arrays stored as tuples) so it can be a jit static argument.
    """

    kinematics: str
    vertices_flat: Tuple[float, ...]
    n_vertices: int
    T: int
    dt: float
    wheelbase: Optional[float]
    max_speed: Tuple[float, float]
    max_acce: Tuple[float, float]
    length: Optional[float] = None
    width: Optional[float] = None
    name: str = ""

    # -- construction -------------------------------------------------------

    @staticmethod
    def create(
        receding: int = 10,
        step_time: float = 0.1,
        kinematics: Optional[str] = None,
        vertices: Optional[Union[Sequence, np.ndarray]] = None,
        max_speed=(inf, inf),
        max_acce=(inf, inf),
        wheelbase: Optional[float] = None,
        length: Optional[float] = None,
        width: Optional[float] = None,
        name: Optional[str] = None,
        **_: object,
    ) -> "Robot":
        if kinematics is None:
            raise ValueError("kinematics is required")
        if kinematics not in KINEMATICS:
            raise ValueError(f"kinematics must be one of {KINEMATICS}, got {kinematics}")

        if vertices is not None:
            verts = np.asarray(vertices, dtype=np.float64)
            if verts.ndim == 2 and verts.shape[0] != 2:
                verts = verts.T  # accept [[x1,y1],...] lists
        else:
            if length is None or width is None:
                raise ValueError("either vertices or length/width must be given")
            verts = rectangle_vertices(length, width, wheelbase)

        if verts.shape[0] != 2 or verts.shape[1] < 3:
            raise ValueError("vertices must be (2, N) with N >= 3")

        ms = _as_bound(max_speed)
        ma = _as_bound(max_acce)
        if kinematics == "acker" and ms[1, 0] >= 1.57:
            # steering-angle clamp, reference robot.py:63-66
            print(
                f"Warning: max steering angle {ms[1, 0]} rad > 1.57 rad, clamped to 1.57"
            )
            ms[1, 0] = 1.57

        return Robot(
            kinematics=kinematics,
            vertices_flat=tuple(float(v) for v in verts.T.reshape(-1)),
            n_vertices=verts.shape[1],
            T=int(receding),
            dt=float(step_time),
            wheelbase=None if wheelbase is None else float(wheelbase),
            max_speed=(float(ms[0, 0]), float(ms[1, 0])),
            max_acce=(float(ma[0, 0]), float(ma[1, 0])),
            length=length,
            width=width,
            name=name or f"{kinematics}_robot_default",
        )

    # -- derived geometry ---------------------------------------------------

    @property
    def vertices(self) -> np.ndarray:
        return np.array(self.vertices_flat, dtype=np.float64).reshape(self.n_vertices, 2).T

    @property
    def G(self) -> np.ndarray:
        return gen_inequal_from_vertex(self.vertices)[0]

    @property
    def h(self) -> np.ndarray:
        return gen_inequal_from_vertex(self.vertices)[1]

    @property
    def edge_dim(self) -> int:
        return self.n_vertices

    @property
    def L(self) -> Optional[float]:
        return self.wheelbase

    @property
    def speed_bound(self) -> np.ndarray:
        return np.array(self.max_speed, dtype=np.float64).reshape(2, 1)

    @property
    def acce_bound(self) -> np.ndarray:
        # per-step acceleration bound, reference robot.py:69
        return np.array(self.max_acce, dtype=np.float64).reshape(2, 1) * self.dt

    # -- exact kinematic step ----------------------------------------------

    def step(self, state: jnp.ndarray, vel: jnp.ndarray, dt: Optional[float] = None) -> jnp.ndarray:
        """Exact nonlinear forward step.  state (3,), vel (2,) -> (3,).

        Mirrors the exact models at initial_path.py:401-444.
        """
        dt = self.dt if dt is None else dt
        phi = state[2]
        v = vel[0]
        if self.kinematics == "acker":
            ds = jnp.stack([v * jnp.cos(phi), v * jnp.sin(phi), v * jnp.tan(vel[1]) / self.wheelbase])
        elif self.kinematics == "diff":
            ds = jnp.stack([v * jnp.cos(phi), v * jnp.sin(phi), vel[1]])
        else:  # omni: vel = [speed, orientation]
            ds = jnp.stack([v * jnp.cos(vel[1]), v * jnp.sin(vel[1]), jnp.zeros_like(v)])
        return state + dt * ds

    def rollout(self, s0: jnp.ndarray, u_seq: jnp.ndarray) -> jnp.ndarray:
        """Roll the exact model along a control sequence.

        s0 (3,), u_seq (2, T) -> states (3, T+1) including s0.
        """

        def body(s, u):
            s_next = self.step(s, u)
            return s_next, s_next

        _, states = jax.lax.scan(body, s0, u_seq.T)
        return jnp.concatenate([s0[:, None], states.T], axis=1)

    # -- linearization ------------------------------------------------------

    def linearize(self, nom_s: jnp.ndarray, nom_u: jnp.ndarray):
        """Per-step linearization around a nominal trajectory.

        nom_s (3, T+1), nom_u (2, T) -> (A (T,3,3), B (T,3,2), C (T,3,1))
        such that the linearized dynamics read s_{t+1} = A_t s_t + B_t u_t + C_t.

        Closed forms match reference robot.py:272-316; unit tests verify them
        against jax.jacobian of the exact models.
        """
        dt = self.dt
        T = nom_u.shape[1]
        phi = nom_s[2, :T]
        v = nom_u[0, :]
        zeros = jnp.zeros_like(v)
        ones = jnp.ones_like(v)

        if self.kinematics in ("acker", "diff"):
            sin_p, cos_p = jnp.sin(phi), jnp.cos(phi)
            A = jnp.stack(
                [
                    jnp.stack([ones, zeros, -v * dt * sin_p], axis=-1),
                    jnp.stack([zeros, ones, v * dt * cos_p], axis=-1),
                    jnp.stack([zeros, zeros, ones], axis=-1),
                ],
                axis=1,
            )  # (T, 3, 3)
            if self.kinematics == "acker":
                psi = nom_u[1, :]
                cos_psi2 = jnp.cos(psi) ** 2
                L = self.wheelbase
                B_r2 = jnp.stack([jnp.tan(psi) * dt / L, v * dt / (L * cos_psi2)], axis=-1)
                C_r2 = -psi * v * dt / (L * cos_psi2)
            else:
                B_r2 = jnp.stack([zeros, dt * ones], axis=-1)
                C_r2 = zeros
            B = jnp.stack(
                [
                    jnp.stack([cos_p * dt, zeros], axis=-1),
                    jnp.stack([sin_p * dt, zeros], axis=-1),
                    B_r2,
                ],
                axis=1,
            )  # (T, 3, 2)
            C = jnp.stack(
                [phi * v * sin_p * dt, -phi * v * cos_p * dt, C_r2], axis=-1
            )[..., None]  # (T, 3, 1)
        else:  # omni: controls [speed, orientation]; A = I
            theta = nom_u[1, :]
            sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
            A = jnp.broadcast_to(jnp.eye(3, dtype=nom_s.dtype), (T, 3, 3))
            B = jnp.stack(
                [
                    jnp.stack([cos_t * dt, -v * sin_t * dt], axis=-1),
                    jnp.stack([sin_t * dt, v * cos_t * dt], axis=-1),
                    jnp.stack([zeros, zeros], axis=-1),
                ],
                axis=1,
            )
            C = jnp.stack(
                [theta * v * sin_t * dt, -theta * v * cos_t * dt, zeros], axis=-1
            )[..., None]

        return A, B, C
