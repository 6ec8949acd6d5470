"""Device-mesh construction and sharding specs for spatial domain decomposition.

TPU-native replacement for the reference's thread-driven multi-GPU layer
(reference gpu/multi_gpu.py:39-298, multi_gpu_solver.py:22-117):

- STRIP_X / STRIP_Y / BLOCK_2D decompositions (reference
  multi_gpu_solver.py:342-445) become 1D/2D ``jax.sharding.Mesh`` axes.
- ADAPTIVE decomposition (pick the longer dimension,
  reference multi_gpu_solver.py:438-443) becomes mesh-shape selection here.
- Device discovery/load-balancing (reference multi_gpu.py:85-264) collapses
  to ``jax.devices()`` — TPU slices are homogeneous.

Grid levels are sharded ('x','y') over padded arrays while each device keeps
at least a tile; below that the level is **replicated** (coarse-level
agglomeration — the thing the reference faked with a damped-residual
correction, reference multi_gpu_solver.py:574-593).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.grid import Grid

AXES = ("x", "y")


def choose_mesh_shape(n_devices: int, grid: Optional[Grid] = None) -> Tuple[int, int]:
    """Pick a 2D mesh shape: near-square, longer grid dimension gets the
    larger mesh axis (reference ADAPTIVE semantics, multi_gpu_solver.py:438)."""
    best = (1, n_devices)
    for mx in range(1, n_devices + 1):
        if n_devices % mx:
            continue
        my = n_devices // mx
        if abs(mx - my) < abs(best[0] - best[1]):
            best = (mx, my)
    mx, my = best
    if grid is not None and grid.nx < grid.ny and mx > my:
        mx, my = my, mx
    return (mx, my)


def make_mesh(
    devices: Optional[Sequence] = None,
    shape: Optional[Tuple[int, int]] = None,
    grid: Optional[Grid] = None,
) -> Mesh:
    """Build a 2D ('x','y') device mesh over the given / all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = choose_mesh_shape(len(devices), grid)
    arr = np.asarray(devices[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(arr, AXES)


def grid_sharding(mesh: Mesh, grid: Grid, min_points_per_device: int = 16):
    """NamedSharding for a level: block-partitioned while every device keeps
    >= min_points_per_device rows/cols of the padded array, else replicated
    (coarse-level agglomeration switchover)."""
    px, py = grid.shape_padded
    mx = mesh.shape["x"]
    my = mesh.shape["y"]
    # gate on LOGICAL extent: sharding a level whose logical points fit on one
    # device just spreads padding around (and the blocks must tile evenly)
    spec_x = "x" if grid.nx // mx >= min_points_per_device and px % mx == 0 else None
    spec_y = "y" if grid.ny // my >= min_points_per_device and py % my == 0 else None
    return NamedSharding(mesh, P(spec_x, spec_y))


def grid_sharding3d(mesh: Mesh, grid3d, min_points_per_device: int = 16):
    """NamedSharding for a 3D level: block-partition (x, y) over the mesh,
    keep z (the lane axis) local — stencil halos then ride the mesh in x/y
    only, and every z-line (the line-smoother solve direction) stays on one
    device."""
    px, py, pz = grid3d.shape_padded
    mx = mesh.shape["x"]
    my = mesh.shape["y"]
    spec_x = "x" if grid3d.nx // mx >= min_points_per_device and px % mx == 0 \
        else None
    spec_y = "y" if grid3d.ny // my >= min_points_per_device and py % my == 0 \
        else None
    return NamedSharding(mesh, P(spec_x, spec_y, None))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_level_arrays(mesh: Mesh, grid: Grid, *arrays, min_points_per_device: int = 16):
    """device_put arrays with the level's sharding."""
    sh = grid_sharding(mesh, grid, min_points_per_device)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
