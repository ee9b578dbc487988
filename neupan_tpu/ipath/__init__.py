"""Initial-path subsystem: generation, tracking, and MPC reference assembly.

Host-side (numpy) re-implementation of the reference InitialPath
(reference: blocks/initial_path.py) — this layer is control-flow heavy and
runs once per control tick on small data, so it deliberately stays off the
TPU; it produces the fixed-shape (nom_s, nom_u, ref_s, ref_us) arrays that
feed the jitted PAN core.

Capabilities (parity checklist item 6, SURVEY.md §2.3):
  * waypoints -> line / dubins / reeds curves with gear flags
    (own generators in ipath/curves.py, replacing gctl);
  * multi-curve splitting at gear changes, loop mode;
  * sliding-window closest-point tracking, per-curve + final arrival;
  * nominal rollout of the current velocity plan through the exact
    kinematics + reference advance via circle-segment intersection;
  * runtime path replacement from external planners.
"""

from __future__ import annotations

from math import cos, inf, sin, sqrt, tan
from typing import List, Optional, Sequence

import numpy as np

from neupan_tpu.ipath.curves import generate_curve
from neupan_tpu.robot import Robot
from neupan_tpu.utils import distance, wrap_to_pi


class InitialPath:
    def __init__(
        self,
        receding: int,
        step_time: float,
        ref_speed: float,
        robot: Robot,
        waypoints: Optional[Sequence] = None,
        loop: bool = False,
        curve_style: str = "line",
        **kwargs,
    ) -> None:
        self.T = receding
        self.dt = step_time
        self.ref_speed = ref_speed
        self.robot = robot
        self.waypoints = self._to_np_list(waypoints)
        self.loop = loop
        self.curve_style = curve_style
        self.min_radius = kwargs.get("min_radius", self.default_turn_radius())
        self.interval = kwargs.get("interval", self.dt * self.ref_speed)
        self.arrive_threshold = kwargs.get("arrive_threshold", 0.1)
        self.close_threshold = kwargs.get("close_threshold", 0.1)
        self.ind_range = kwargs.get("ind_range", 10)
        self.arrive_index_threshold = kwargs.get("arrive_index_threshold", 1)
        self.arrive_flag = False

        self.initial_path: Optional[List[np.ndarray]] = None
        self.curve_list: List[List[np.ndarray]] = []
        self.curve_index = 0
        self.point_index = 0

    # ------------------------------------------------------------------
    # MPC reference assembly (reference initial_path.py:68-126)
    # ------------------------------------------------------------------

    def generate_nom_ref_state(self, state: np.ndarray, cur_vel_array: np.ndarray,
                               ref_speed: float):
        """Build nominal + reference trajectories for the receding horizon.

        Returns (nom_s (3,T+1), nom_u (2,T), ref_s (3,T+1), ref_us (T,)).
        """
        state = np.asarray(state, dtype=np.float64)[:3].reshape(3, 1)

        ref_state = self.cur_point[0:3].copy()
        ref_index = self.point_index
        pre_state = state.copy()

        state_pre_list = [pre_state]
        state_ref_list = [ref_state]

        gear_list = [float(self.cur_point[-1, 0])] * self.T
        ref_speed_forward = ref_speed * self.dt

        for t in range(self.T):
            pre_state = self.motion_predict_model(
                pre_state, cur_vel_array[:, t: t + 1], self.robot.L, self.dt
            )
            state_pre_list.append(pre_state)

            if ref_speed_forward >= self.interval:
                inc_index = int(ref_speed_forward / self.interval)
                ref_index = ref_index + inc_index
                if ref_index > len(self.cur_curve) - 1:
                    ref_index = len(self.cur_curve) - 1
                    gear_list[t] = 0.0
                ref_state = self.cur_curve[ref_index][0:3].copy()
            else:
                ref_state, ref_index = self.find_interaction_point(
                    ref_state, ref_index, ref_speed_forward
                )
                if ref_index > len(self.cur_curve) - 1:
                    gear_list[t] = 0.0

            # unwrap reference heading relative to the predicted heading
            diff = ref_state[2, 0] - pre_state[2, 0]
            ref_state = ref_state.copy()
            ref_state[2, 0] = pre_state[2, 0] + wrap_to_pi(diff)
            state_ref_list.append(ref_state)

        nom_s = np.hstack(state_pre_list)
        nom_u = np.asarray(cur_vel_array, dtype=np.float64)
        ref_s = np.hstack(state_ref_list)
        ref_us = np.array(gear_list) * ref_speed
        return nom_s, nom_u, ref_s, ref_us

    # ------------------------------------------------------------------
    # path tracking / arrival (reference initial_path.py:166-292)
    # ------------------------------------------------------------------

    def closest_point(self, state, threshold=0.1, ind_range=10):
        """Sliding-window closest-point search; updates self.point_index."""
        min_dis = inf
        start = max(self.point_index, 0)
        end = min(self.point_index + ind_range, len(self.cur_curve))
        for index in range(start, end):
            dis = distance(state[0:2], self.cur_curve[index][0:2])
            if dis < min_dis:
                min_dis = dis
                self.point_index = index
                if dis < threshold:
                    break
        return min_dis

    def find_interaction_point(self, ref_state, ref_index, length):
        """Advance the reference along the curve by arc ``length`` using a
        circle-segment intersection (initial_path.py:185-249)."""
        circle = np.squeeze(ref_state[0:2])
        while True:
            if ref_index > len(self.cur_curve) - 2:
                end_point = self.cur_curve[-1].copy()
                end_point[2] = wrap_to_pi(float(end_point[2, 0]))
                return end_point[0:3], ref_index

            cur_point = self.cur_curve[ref_index]
            next_point = self.cur_curve[ref_index + 1]
            segment = [np.squeeze(cur_point[0:2]), np.squeeze(next_point[0:2])]
            interaction_point = self.range_cir_seg(circle, length, segment)
            if interaction_point is not None:
                diff = wrap_to_pi(float(next_point[2, 0] - cur_point[2, 0]))
                theta = wrap_to_pi(float(cur_point[2, 0]) + diff / 2)
                state_ref = np.append(interaction_point, theta).reshape((3, 1))
                return state_ref, ref_index
            ref_index += 1

    @staticmethod
    def range_cir_seg(circle, r, segment):
        """Forward intersection of a circle with a segment (t in [0, 1])."""
        sp, ep = segment
        d = ep - sp
        if np.linalg.norm(d) == 0:
            return None
        f = sp - circle
        a = d @ d
        b = 2 * f @ d
        c = f @ f - r * r
        disc = b * b - 4 * a * c
        if disc < 0:
            return None
        t2 = (-b + sqrt(disc)) / (2 * a)
        if 0 <= t2 <= 1:
            return sp + t2 * d
        return None

    def check_arrive(self, state) -> bool:
        self.init_check(state)
        self.closest_point(state, self.close_threshold, self.ind_range)

        if self.check_curve_arrive(state, self.arrive_threshold,
                                   self.arrive_index_threshold):
            if self.curve_index + 1 >= self.curve_number:
                if self.loop:
                    self.curve_index = 0
                    self.point_index = 0
                    print("Info: loop, reset the path")
                    return False
                if not self.arrive_flag:
                    print("Info: arrive at the end of the path")
                    self.arrive_flag = True
                return True
            self.curve_index += 1
            self.point_index = 0
        return False

    def check_curve_arrive(self, state, arrive_threshold=0.1,
                           arrive_index_threshold=2) -> bool:
        final_point = self.cur_curve[-1][0:2]
        arrive_distance = np.linalg.norm(state[0:2] - final_point)
        return (
            arrive_distance < arrive_threshold
            and self.point_index >= (len(self.cur_curve) - arrive_index_threshold - 2)
        )

    # ------------------------------------------------------------------
    # path generation / replacement (reference initial_path.py:128-386)
    # ------------------------------------------------------------------

    def split_path_with_gear(self):
        if self.initial_path is None:
            raise AttributeError("initial_path is not set")
        self.curve_list = []
        current_curve: List[np.ndarray] = []
        current_gear = self.initial_path[0][-1]
        for point in self.initial_path:
            if point[-1] != current_gear:
                self.curve_list.append(current_curve)
                current_curve = []
                current_gear = point[-1]
            current_curve.append(point)
        if current_curve:
            self.curve_list.append(current_curve)

    def set_initial_path(self, path):
        """Install an externally provided path (list of (4,1) arrays)."""
        self.initial_path = path
        self.interval = self.cal_average_interval(path)
        self.split_path_with_gear()
        self.curve_index = 0
        self.point_index = 0

    @staticmethod
    def cal_average_interval(path) -> float:
        if len(path) < 2:
            return 0.0
        dist_sum = 0.0
        for p1, p2 in zip(path, path[1:]):
            dist_sum += float(np.hypot(p2[0, 0] - p1[0, 0], p2[1, 0] - p1[1, 0]))
        return dist_sum / (len(path) - 1)

    def init_path_with_state(self, state):
        assert len(self.waypoints) > 0, "Error: waypoints are not set"
        if isinstance(self.waypoints, list):
            self.waypoints = [np.asarray(state, dtype=np.float64).reshape(-1, 1)[:3]] + self.waypoints
        else:
            self.waypoints = np.vstack([state, self.waypoints])
        if self.loop:
            self.waypoints = self.waypoints + [self.waypoints[0]]
        self._generate()

    def _generate(self):
        self.initial_path = generate_curve(
            self.curve_style, self.waypoints, self.interval, self.min_radius, True
        )
        if self.curve_style == "line":
            self._ensure_consistent_angles()

    def init_check(self, state):
        if self.initial_path is None:
            print("initial path is not set, generate path with the current state")
            self.set_ipath_with_state(state)

    def set_ipath_with_state(self, state):
        self.init_path_with_state(np.asarray(state, dtype=np.float64).reshape(-1, 1)[0:3])
        self.split_path_with_gear()
        self.curve_index = 0
        self.point_index = 0

    def update_initial_path_from_goal(self, start, goal):
        waypoints = [start, goal, start] if self.loop else [start, goal]
        self.waypoints = waypoints
        self._generate()
        self.split_path_with_gear()
        self.curve_index = 0
        self.point_index = 0

    def set_ipath_with_waypoints(self, waypoints):
        self.waypoints = self._to_np_list(waypoints)
        self._generate()
        self.split_path_with_gear()
        self.curve_index = 0
        self.point_index = 0

    # ------------------------------------------------------------------
    # exact motion models (reference initial_path.py:388-444)
    # ------------------------------------------------------------------

    def motion_predict_model(self, robot_state, vel, wheel_base, sample_time):
        if self.robot.kinematics == "acker":
            return self.ackermann_model(robot_state, vel, wheel_base, sample_time)
        if self.robot.kinematics == "diff":
            return self.diff_model(robot_state, vel, sample_time)
        return self.omni_model(robot_state, vel, sample_time)

    @staticmethod
    def ackermann_model(car_state, vel, wheel_base, sample_time):
        phi = car_state[2, 0]
        v, psi = vel[0, 0], vel[1, 0]
        ds = np.array([[v * cos(phi)], [v * sin(phi)], [v * tan(psi) / wheel_base]])
        return car_state + ds * sample_time

    @staticmethod
    def diff_model(robot_state, vel, sample_time):
        phi = robot_state[2, 0]
        v, w = vel[0, 0], vel[1, 0]
        ds = np.array([[v * cos(phi)], [v * sin(phi)], [w]])
        return robot_state + ds * sample_time

    @staticmethod
    def omni_model(robot_state, vel, sample_time):
        vx = vel[0, 0] * cos(vel[1, 0])
        vy = vel[0, 0] * sin(vel[1, 0])
        return robot_state + sample_time * np.array([[vx], [vy], [0.0]])

    # ------------------------------------------------------------------
    # properties / misc
    # ------------------------------------------------------------------

    @property
    def cur_waypoints(self):
        return self.waypoints

    @property
    def cur_curve(self):
        return self.curve_list[self.curve_index]

    @property
    def cur_point(self):
        return self.cur_curve[self.point_index]

    @property
    def curve_number(self):
        return len(self.curve_list)

    def default_turn_radius(self) -> float:
        if self.robot.kinematics == "acker":
            return self.robot.L / tan(self.robot.max_speed[1])
        return 0.0

    def _ensure_consistent_angles(self):
        """Overwrite line-curve headings with travel direction
        (initial_path.py:472-492)."""
        if self.initial_path is None or len(self.initial_path) < 2:
            return
        for i in range(len(self.initial_path) - 1):
            cur, nxt = self.initial_path[i], self.initial_path[i + 1]
            dx = nxt[0, 0] - cur[0, 0]
            dy = nxt[1, 0] - cur[1, 0]
            cur[2, 0] = np.arctan2(dy, dx)
        self.initial_path[-1][2, 0] = self.initial_path[-2][2, 0]

    @staticmethod
    def _to_np_list(point_list):
        if point_list is None:
            return []
        return [np.c_[p] if isinstance(p, list) else np.asarray(p, dtype=np.float64).reshape(-1, 1)
                for p in point_list]
