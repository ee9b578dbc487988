"""Scenario-parallel scaling: vmap within a chip, shard_map across the mesh.

The reference is strictly single-process/single-device (SURVEY.md §2); the
TPU build scales by batching thousands of *independent planning scenarios*:

  * ``batched_planner_step`` — one chip: vmap of the full PAN control step
    over a scenario axis (the benchmark workhorse);
  * ``sharded_planner_step`` — a pod slice: shard_map over a
    ``jax.sharding.Mesh``, scenario axis laid out on ICI; no collectives are
    needed in the hot loop (scenarios are independent), psum only for
    benchmark/telemetry aggregation;
  * ``make_mesh`` — helper for 1-D / 2-D meshes over available devices.

DUNE training also data-parallelizes here (gradient psum across the mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neupan_tpu.ops.nrmp import AdjustParams
from neupan_tpu.ops.pan import PANSpec, PANState, init_state, pan_forward


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "scenario") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batched_init_state(spec: PANSpec, batch: int) -> PANState:
    one = init_state(spec)
    return jax.tree.map(lambda v: jnp.broadcast_to(v, (batch,) + v.shape), one)


def batched_planner_step(spec: PANSpec, dune_params, G, h,
                         adjust: AdjustParams,
                         nom_s, nom_u, ref_s, ref_us,
                         points, velocities, mask, state: PANState):
    """vmap the full PAN step over a leading scenario axis.

    All array arguments carry a leading batch dimension; dune_params /
    G / h / adjust are broadcast (shared weights across scenarios).
    """
    return jax.vmap(
        lambda *a: pan_forward(spec, dune_params, G, h, adjust, *a)
    )(nom_s, nom_u, ref_s, ref_us, points, velocities, mask, state)


def sharded_planner_step(spec: PANSpec, mesh: Mesh, dune_params, G, h,
                         adjust: AdjustParams,
                         nom_s, nom_u, ref_s, ref_us,
                         points, velocities, mask, state: PANState,
                         axis_name: str = "scenario"):
    """shard_map of the batched step: scenario axis split across the mesh.

    The per-shard computation is the plain vmapped step; weights are
    replicated. Returns outputs with the same scenario sharding.
    """
    shard = P(axis_name)
    repl = P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(repl, repl, repl, repl,
                       shard, shard, shard, shard,
                       shard, shard, shard, shard),
             out_specs=shard, check_vma=False)
    def _step(dune_params, G, h, adjust, nom_s, nom_u, ref_s, ref_us,
              points, velocities, mask, state):
        return batched_planner_step(spec, dune_params, G, h, adjust,
                                    nom_s, nom_u, ref_s, ref_us,
                                    points, velocities, mask, state)

    return _step(dune_params, G, h, adjust, nom_s, nom_u, ref_s, ref_us,
                 points, velocities, mask, state)


def scenario_sharding(mesh: Mesh, axis_name: str = "scenario") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
