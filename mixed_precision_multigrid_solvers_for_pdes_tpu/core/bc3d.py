"""3D boundary-condition specification and masks.

3D sibling of core/bc.py (same BCSide/BCKind vocabulary, six sides):
Dirichlet faces are fixed, Neumann/Robin faces are unknowns with ghost
elimination in ops/stencil3d.py, periodic axes keep unique nodes 0..n-2 with
wrap ghosts in the padding. The reference never shipped ANY 3D boundary
handling (its 3D solvers were stubs, reference
applications/poisson_solver.py:483-557).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .bc import BCKind, BCSide
from .grid3d import Grid3D

# (axis, low/high): west/east = x-/x+, south/north = y-/y+, bottom/top = z-/z+
SIDES3D = ("west", "east", "south", "north", "bottom", "top")
_AXIS = {"west": 0, "east": 0, "south": 1, "north": 1, "bottom": 2, "top": 2}
_LOW = {"west": True, "east": False, "south": True, "north": False,
        "bottom": True, "top": False}


@dataclasses.dataclass(frozen=True)
class BoundarySpec3D:
    """Static, hashable BC description for all six faces."""

    west: BCSide = BCSide()
    east: BCSide = BCSide()
    south: BCSide = BCSide()
    north: BCSide = BCSide()
    bottom: BCSide = BCSide()
    top: BCSide = BCSide()

    def side(self, name: str) -> BCSide:
        return getattr(self, name)

    @property
    def all_dirichlet(self) -> bool:
        return all(self.side(s).kind == BCKind.DIRICHLET for s in SIDES3D)

    @property
    def any_periodic(self) -> bool:
        return any(self.side(s).kind == BCKind.PERIODIC for s in SIDES3D)

    def validate(self) -> None:
        for lo, hi in (("west", "east"), ("south", "north"),
                       ("bottom", "top")):
            if ((self.side(lo).kind == BCKind.PERIODIC)
                    != (self.side(hi).kind == BCKind.PERIODIC)):
                raise ValueError(
                    f"periodic BC must be set on both {lo} and {hi}")


def mixed3d(**kwargs) -> BoundarySpec3D:
    """Build a spec from per-side kinds, e.g. mixed3d(top='neumann')."""
    sides = {}
    for name in SIDES3D:
        val = kwargs.get(name, "dirichlet")
        sides[name] = val if isinstance(val, BCSide) else BCSide(kind=BCKind(val))
    return BoundarySpec3D(**sides)


def neumann3d() -> BoundarySpec3D:
    side = BCSide(kind=BCKind.NEUMANN)
    return BoundarySpec3D(*(side,) * 6)


def _iotas(grid: Grid3D):
    pshape = grid.shape_padded
    return (jax.lax.broadcasted_iota(jnp.int32, pshape, 0),
            jax.lax.broadcasted_iota(jnp.int32, pshape, 1),
            jax.lax.broadcasted_iota(jnp.int32, pshape, 2))


def unknown_mask3d(grid: Grid3D, spec: BoundarySpec3D = BoundarySpec3D()):
    """True where the solver owns the node (cf. core/bc.unknown_mask)."""
    i, j, k = _iotas(grid)
    dims = (grid.nx, grid.ny, grid.nz)
    mask = (i < dims[0]) & (j < dims[1]) & (k < dims[2])
    for idx, (lo, hi) in zip((i, j, k), (("west", "east"), ("south", "north"),
                                         ("bottom", "top"))):
        n = dims[_AXIS[lo]]
        if spec.side(lo).kind == BCKind.PERIODIC:
            mask &= idx < n - 1
        else:
            if spec.side(lo).kind == BCKind.DIRICHLET:
                mask &= idx > 0
            if spec.side(hi).kind == BCKind.DIRICHLET:
                mask &= idx < n - 1
    return mask


def side_mask3d(name: str, grid: Grid3D):
    """Logical nodes of one face."""
    i, j, k = _iotas(grid)
    logical = (i < grid.nx) & (j < grid.ny) & (k < grid.nz)
    ax = _AXIS[name]
    idx = (i, j, k)[ax]
    n = (grid.nx, grid.ny, grid.nz)[ax]
    return logical & (idx == (0 if _LOW[name] else n - 1))


def periodic_sync3d(grid: Grid3D, spec: BoundarySpec3D):
    """Wrap-ghost refresher (None if no periodic axis). Same convention as
    2D: node n-1 duplicates node 0; padded line p-1 carries node n-2."""
    pshape = grid.shape_padded
    wraps = []
    for ax, lo in ((0, "west"), (1, "south"), (2, "bottom")):
        if spec.side(lo).kind == BCKind.PERIODIC:
            wraps.append(ax)
    if not wraps:
        return None
    dims = (grid.nx, grid.ny, grid.nz)

    def sync(u):
        for ax in wraps:
            n = dims[ax]
            p = pshape[ax]

            def set_line(u, dst, src_idx):
                sl_dst = [slice(None)] * 3
                sl_dst[ax] = dst
                sl_src = [slice(None)] * 3
                sl_src[ax] = src_idx
                return u.at[tuple(sl_dst)].set(u[tuple(sl_src)])

            u = set_line(u, n - 1, 0)
            u = set_line(u, p - 1, n - 2)
        return u

    return sync
