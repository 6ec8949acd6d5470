"""Level-0 plane-resident mixed-precision solver (the HBM parity layout).

The DESIGN.md follow-up to the measured in-kernel parity loss: the finest
level's u, f, r live as stacked parity planes (ops/planes.py) for the WHOLE
solve — split once, merged once. Level-0 smoothing runs the Pallas plane
multisweep (half the VPU work of the direct kernel, same HBM bytes, zero
transposes); level-0 transfers become same-width plane rolls with NO
lane decimation/interleave anywhere (the coarse lattice IS the ee plane);
the f64 outer IR residual is computed in plane space too. Levels >= 1 are
the standard hierarchy (they cost a fraction of level 0).

Scope gate (the flagship configuration): >= 2 levels, level-0 scalar
constant-coefficient all-Dirichlet stencil, fp32 level-0 dtype, V cycles,
full-weighting/bilinear. ``plane_ir_solve`` mirrors
solvers.refinement.ir_solve (f64 outer residual over fp32 cycles; no FMG —
A/B against the standard path runs both arms without FMG).

Measured role: the solve-level prototype VERDICT r4 next-round #3 asked for
— scripts/plane_ab.py produces the decision rows.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import planes as pln
from ..ops import stencil as st_mod
from . import multigrid as mg_mod
from .multigrid import Level, MultigridConfig


def plane_solve_ok(levels, cfg: MultigridConfig) -> bool:
    """True when the plane-resident level-0 path applies."""
    if len(levels) < 2 or cfg.cycle != "V":
        return False
    lev0 = levels[0]
    if jnp.ndim(lev0.stencil.c) != 0 or isinstance(lev0.stencil,
                                                   st_mod.Stencil9):
        return False
    if lev0.domain is not None or not lev0.spec.all_dirichlet:
        return False
    if cfg.restriction != "full_weighting" or cfg.prolongation != "bilinear":
        return False
    if cfg.smoother not in ("rbgs", "gauss_seidel", "red_black", "sor"):
        return False
    return jnp.dtype(levels[0].dtype) == jnp.dtype(jnp.float32)


def _stp(stencil, dtype):
    return tuple(jnp.asarray(getattr(stencil, k), dtype)
                 for k in ("c", "w", "e", "s", "n"))


def _smooth_planes(lev0, up, fp, cfg, sweeps, interpret=False):
    from ..ops.pallas_kernels import smooth_planes as psp

    return psp.multisweep_planes(
        lev0.stencil, up, fp, nx=lev0.grid.nx, ny=lev0.grid.ny,
        sweeps=sweeps, omega=cfg.omega, interpret=interpret)


def plane_cycle(levels, up, fp, cfg: MultigridConfig, masks,
                interpret: bool = False):
    """One V-cycle with level 0 in plane space (levels >= 1 standard)."""
    lev0 = levels[0]
    stp = _stp(lev0.stencil, jnp.float32)
    up = _smooth_planes(lev0, up, fp, cfg, cfg.pre_sweeps, interpret)
    rp = pln.plane_residual(stp, up, fp, masks)
    nxt = levels[1]
    fc = pln.restrict_planes(rp, nxt.grid.nx, nxt.grid.ny,
                             nxt.grid.shape_padded, dtype=nxt.dtype)
    ec = jnp.zeros(nxt.grid.shape_padded, nxt.dtype)
    ec = mg_mod._cycle(levels, ec, fc, 1, cfg, "V")
    up = pln.prolong_correct_planes(ec, up, masks)
    up = _smooth_planes(lev0, up, fp, cfg, cfg.post_sweeps, interpret)
    return up


@partial(jax.jit, static_argnames=("cfg", "inner_cycles", "max_outer",
                                   "interpret"))
def _plane_ir_jit(levels, f64, u064, cfg: MultigridConfig,
                  inner_cycles: int, max_outer: int,
                  interpret: bool = False):
    lev0 = levels[0]
    g = lev0.grid
    masks = pln.plane_masks(g)
    stp_hi = _stp(lev0.stencil, jnp.float64)
    fp64 = pln.split_field(f64.astype(jnp.float64))
    u64 = pln.split_field(u064.astype(jnp.float64))

    fnorm = pln.plane_norm_scaled_l2(
        jnp.where(masks, fp64, jnp.zeros((), jnp.float64)), g.hx, g.hy)
    r0 = pln.plane_residual(stp_hi, u64, fp64, masks)
    rnorm0 = pln.plane_norm_scaled_l2(r0, g.hx, g.hy)
    scale = jnp.maximum(fnorm, rnorm0)
    tol_eff = jnp.where(jnp.asarray(cfg.rtol),
                        cfg.tol * jnp.maximum(scale, 1e-300), cfg.tol)
    hist = jnp.full((max_outer + 1,), jnp.nan, jnp.float64)
    hist = hist.at[0].set(rnorm0)

    def cond(carry):
        _, k, rnorm, _ = carry
        return (rnorm > tol_eff) & (k < max_outer)

    def body(carry):
        u64, k, rnorm, hist = carry
        rp = pln.plane_residual(stp_hi, u64, fp64, masks)
        ep = jnp.zeros_like(rp, dtype=jnp.float32)
        rp32 = rp.astype(jnp.float32)
        for _ in range(inner_cycles):
            ep = plane_cycle(levels, ep, rp32, cfg, masks, interpret)
        u64 = jnp.where(masks, u64 + ep.astype(jnp.float64), u64)
        rnorm = pln.plane_norm_scaled_l2(
            pln.plane_residual(stp_hi, u64, fp64, masks), g.hx, g.hy)
        hist = hist.at[k + 1].set(rnorm)
        return (u64, k + 1, rnorm, hist)

    u64, k, rnorm, hist = jax.lax.while_loop(
        cond, body, (u64, jnp.asarray(0, jnp.int32), rnorm0, hist))
    u = pln.merge_field(u64, g.shape_padded)
    stats = jnp.stack([
        k.astype(jnp.float64), rnorm, rnorm0, fnorm,
        (rnorm <= tol_eff).astype(jnp.float64),
    ])
    return u, jnp.concatenate([stats, hist])


def plane_ir_solve(
    levels: Tuple[Level, ...],
    f,
    u0=None,
    cfg: MultigridConfig = MultigridConfig(),
    *,
    inner_cycles: int = 2,
    max_outer: int = 100,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Mixed-precision IR solve with the level-0 state HBM-plane-resident.

    Same outer structure and stopping rule as refinement.ir_solve (without
    FMG); returns the merged padded solution + the standard info dict."""
    if not plane_solve_ok(levels, cfg):
        raise ValueError("plane_ir_solve: configuration outside the "
                         "plane-resident gate (see plane_solve_ok)")
    if u0 is None:
        u0 = jnp.zeros(levels[0].grid.shape_padded, jnp.float64)
    u, packed = _plane_ir_jit(levels, jnp.asarray(f, jnp.float64),
                              jnp.asarray(u0, jnp.float64), cfg,
                              int(inner_cycles), int(max_outer), interpret)
    info = mg_mod._unpack_info(np.asarray(packed))
    info["method"] = "plane_ir"
    return u, info
