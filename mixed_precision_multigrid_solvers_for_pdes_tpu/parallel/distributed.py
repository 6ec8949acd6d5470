"""Sharded multigrid solves over a device mesh (GSPMD path).

The whole solve is one jitted SPMD computation: fine levels are
block-partitioned ('x','y') over the mesh, coarse levels below the tile
threshold are replicated (agglomeration), and XLA inserts the halo collectives
for the stencil shifts. This replaces the reference's hand-rolled
thread + device-to-device-copy iteration (reference
gpu/multi_gpu_solver.py:244-643), including the part it faked: a *real*
multilevel coarse-grid correction under domain decomposition
(vs the damped-residual placeholder at reference multi_gpu_solver.py:574-593).

The explicitly-scheduled shard_map + ppermute halo path lives in
parallel/halo_solve.py; this module is the portable default.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..solvers import multigrid as mg_mod
from ..solvers.multigrid import MultigridConfig
from . import mesh as mesh_mod


def _sharding_fn(mesh):
    """Pick the per-level sharding rule matching the mesh's axis names:
    graded three-tier for make_graded_mesh meshes, two-tier otherwise."""
    if set(mesh.axis_names) == set(mesh_mod.GRADED_AXES):
        return mesh_mod.graded_sharding
    return mesh_mod.grid_sharding


def make_constrainer(mesh, min_points_per_device: int = 16):
    """(array, Level) -> array hook injecting per-level sharding constraints."""
    sharding = _sharding_fn(mesh)

    def constrain(arr, lev):
        return jax.lax.with_sharding_constraint(
            arr, sharding(mesh, lev.grid, min_points_per_device)
        )

    return constrain


def shard_inputs(mesh, levels, *arrays, min_points_per_device: int = 16):
    sh = _sharding_fn(mesh)(mesh, levels[0].grid, min_points_per_device)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def sharded_solve(
    mesh,
    levels,
    f,
    u0=None,
    cfg: MultigridConfig = MultigridConfig(),
    *,
    min_points_per_device: int = 16,
    **kw,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """mg_solve with inputs sharded over ``mesh`` and per-level constraints."""
    if u0 is None:
        u0 = jnp.zeros(levels[0].grid.shape_padded, levels[0].dtype)
    f, u0 = shard_inputs(mesh, levels, f, u0,
                         min_points_per_device=min_points_per_device)
    constrain = make_constrainer(mesh, min_points_per_device)
    return mg_mod.mg_solve(levels, f, u0, cfg, constrain=constrain, **kw)


def make_constrainer3d(mesh, min_points_per_device: int = 16):
    """3D constrainer: (x, y) block-partitioned, z local (lane axis +
    line-smoother direction stay on-device)."""

    def constrain(arr, lev):
        return jax.lax.with_sharding_constraint(
            arr, mesh_mod.grid_sharding3d(mesh, lev.grid,
                                          min_points_per_device)
        )

    return constrain
