"""Irregular (masked) solution domains.

The reference's L-shaped / corner-singularity problems
(reference applications/test_problems.py:161-295) pose the PDE on non-square
domains; this module expresses such domains as static, hashable descriptors
whose node masks are built from iota inside jit (no stored mask arrays, no
HBM traffic — the same design as core/bc.py masks).

A ``DomainSpec`` marks nodes as strictly-inside (solver unknowns) or outside/
on-the-cut (Dirichlet-fixed). The multigrid machinery needs nothing else:
updates, residuals, and transfers are already masked by ``Level.unknown``,
cut-edge nodes hold their Dirichlet values exactly like outer-ring nodes, and
2:1 coarsening keeps cut lines node-aligned for cuts at grid fractions of the
form k/2^m (e.g. the classic 0.5).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .grid import Grid

_TOL = 1e-9


@dataclasses.dataclass(frozen=True)
class LShapedDomain:
    """The unit-square domain minus the closed quadrant
    [x_cut, 1] x [y_cut, 1] (re-entrant corner at (x_cut, y_cut)).

    Nodes inside the removed quadrant INCLUDING its two cut edges are
    Dirichlet-fixed; everything else stays governed by the outer
    BoundarySpec."""

    x_cut: float = 0.5
    y_cut: float = 0.5

    def interior_mask(self, grid: Grid):
        """Padded bool mask: True where the node belongs to the open domain
        (solver may own it, subject to the outer BC mask)."""
        px, py = grid.shape_padded
        i = jax.lax.broadcasted_iota(jnp.int32, (px, py), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (px, py), 1)
        return self.interior_mask_at(grid, i, j)

    def interior_mask_at(self, grid: Grid, i, j):
        """Mask evaluated at arbitrary global index arrays (i, j) — lets
        sharded layouts (parallel/halo_solve.py) build block-local masks
        from iota + axis_index without materializing the global mask."""
        x0, _, y0, _ = grid.domain
        X = x0 + grid.hx * i.astype(jnp.float64)
        Y = y0 + grid.hy * j.astype(jnp.float64)
        removed = (X >= self.x_cut - _TOL) & (Y >= self.y_cut - _TOL)
        return ~removed
