"""Multigrid as a preconditioner for outer Krylov iterations.

Counterpart of reference preconditioning/multigrid_preconditioner.py:20
(MultigridPreconditioner wrapping MultigridSolver for CG/GMRES). One-or-few
V-cycles with zero initial guess approximate A^{-1}; with a symmetric cycle
(equal pre/post sweeps, symmetric smoother) the operator is SPD, so CG is
safe. The cycle traces straight into the Krylov while_loop — no host
round-trips between outer iterations (the reference re-entered Python per
application).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

from ..solvers import multigrid as mg_mod
from ..solvers.multigrid import Level, MultigridConfig


def multigrid_preconditioner(
    levels: Tuple[Level, ...],
    cfg: MultigridConfig = MultigridConfig(smoother="rbgs", omega=1.0),
    *,
    cycles: int = 1,
    constrain=None,
) -> Callable:
    """z = (approx A^{-1}) r via ``cycles`` V/W-cycles from a zero guess.

    ``constrain`` threads per-level sharding constraints through the cycles
    (parallel.distributed.make_constrainer) so MG-preconditioned Krylov runs
    SPMD over a device mesh — the Krylov loop itself is whole-array ops whose
    sharding XLA propagates from the inputs."""
    lev0 = levels[0]

    def apply(r):
        z = jnp.zeros(lev0.grid.shape_padded, r.dtype)
        rl = r.astype(lev0.dtype)
        for _ in range(cycles):
            z = mg_mod.mg_cycle(levels, z, rl, cfg, constrain)
        return z.astype(r.dtype)

    return apply


def multigrid_preconditioner3d(
    levels,
    cfg: MultigridConfig = MultigridConfig(smoother="rbgs", omega=1.0),
    *,
    cycles: int = 1,
    constrain=None,
) -> Callable:
    """3D analogue of :func:`multigrid_preconditioner`: z = (approx A^{-1}) r
    via 3D V/W-cycles from a zero guess (pair with
    ``solvers.krylov.stencil_matvec3d``). The reference had no 3D solver at
    all (reference applications/poisson_solver.py:483-557 is a stub)."""
    from ..solvers import multigrid3d as mg3

    lev0 = levels[0]

    def apply(r):
        z = jnp.zeros(lev0.grid.shape_padded, r.dtype)
        rl = r.astype(lev0.dtype)
        for _ in range(cycles):
            z = mg3.mg_cycle3d(levels, z, rl, cfg, constrain)
        return z.astype(r.dtype)

    return apply
