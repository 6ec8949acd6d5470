"""Functional geometric multigrid driver (V/W/F cycles, FMG), jit-first.

One driver replaces the reference's five (reference solvers/multigrid.py:28,
corrected_multigrid.py:24, advanced_multigrid.py:36, gpu/gpu_solver.py:24,504).
Design (SURVEY.md section 7):

- The hierarchy is a tuple of ``Level``s — stencil coefficients are pytree
  data, grid/BC/dtype are static metadata — so cycles trace once per
  (shape, config) and the *entire solve* (outer iteration included) runs as a
  single XLA computation with no host sync per iteration (the reference GPU
  path synchronized per kernel and read back the norm per iteration,
  reference gpu_solver.py:261-268,346).
- Cycles recurse over levels at trace time (static depth -> fully unrolled).
- Per-level dtypes implement mixed precision (core/precision.py); transfers
  cast at level boundaries, and norms accumulate in float64.
- The coarsest level is smoothed to convergence with red-black GS — the
  hierarchy bottoms out at one interior unknown for power-of-two-plus-one
  grids, where a single sweep is the exact solve (the reference iterated GS to
  1e-12 instead, reference corrected_multigrid.py:366-390).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import bc as bc_mod
from ..core.bc import BoundarySpec
from ..core.grid import Grid
from ..core.precision import PrecisionPolicy, as_dtype
from ..ops import norms, smooth as smooth_mod, stencil as st_mod, transfer
from ..ops.stencil import Stencil


@dataclasses.dataclass(frozen=True)
class Level:
    """One grid level: stencil (data) + static geometry/BC metadata.

    ``domain``: optional hashable DomainSpec (core/domain.py) restricting the
    unknowns to an irregular region (e.g. an L-shape); None = full rectangle.
    """

    stencil: Stencil
    grid: Grid
    spec: BoundarySpec
    dtype: Any
    domain: Any = None

    @property
    def unknown(self):
        mask = bc_mod.unknown_mask(
            self.grid.nx, self.grid.ny, self.grid.shape_padded, self.spec
        )
        if self.domain is not None:
            mask = mask & self.domain.interior_mask(self.grid)
        return mask

    @property
    def sync(self):
        """Periodic wrap-ghost refresher, or None (core/bc.periodic_sync)."""
        return bc_mod.periodic_sync(
            self.grid.nx, self.grid.ny, self.grid.shape_padded, self.spec
        )


jax.tree_util.register_dataclass(
    Level, data_fields=("stencil",),
    meta_fields=("grid", "spec", "dtype", "domain")
)


@dataclasses.dataclass(frozen=True)
class MultigridConfig:
    """Static solver configuration (hashable; reference config/settings.py:58)."""

    cycle: str = "V"              # V | W | F
    pre_sweeps: int = 2
    post_sweeps: int = 2
    smoother: str = "jacobi"      # jacobi | rbgs | sor
    omega: float = 0.8
    coarse_sweeps: int = 32
    max_levels: int = 32
    restriction: str = "full_weighting"
    prolongation: str = "bilinear"
    max_iterations: int = 100
    tol: float = 1e-10
    rtol: bool = True             # tolerance relative to ||f||
    backend: str = "auto"         # auto | xla | pallas
    # Coarse-operator construction: 'rediscretize' rebuilds the analytic
    # stencil on each coarse grid (the reference's implicit choice,
    # reference solvers/multigrid.py:135-182); 'galerkin' forms A_c = R A P
    # (ops/galerkin.py) — robust for strong coefficient jumps, coarse
    # levels become 9-point (XLA path).
    coarsening: str = "rediscretize"
    # RAP-chain compute dtype for coarsening='galerkin'. float64 keeps the
    # chain exact down the hierarchy (free on CPU); float32 is the TPU fast
    # path — f64 is software-emulated on TPU and dominated round-4 Galerkin
    # setup (421-482 s @1025²). The coarse-operator coefficients only steer
    # the correction (solution accuracy is set by the fine operator + IR),
    # and the jump-problem cycle factor is validated unchanged under f32
    # (tests/unit/test_galerkin.py).
    galerkin_dtype: str = "float64"
    # W/F branching applies only on the finest `w_depth` levels; below that the
    # recursion degrades to V. Full W costs 2^L smooth stages *in the unrolled
    # XLA graph* — capping bounds compile time while keeping the robustness
    # benefit where it matters (near the fine grid).
    w_depth: int = 4
    # symmetric=True reverses the RB-GS color order in post-smoothing
    # (black-then-red), making the V-cycle a symmetric operator — required
    # for provably-safe CG preconditioning (VERDICT.md weak #5).
    symmetric: bool = False

    def replace(self, **kw) -> "MultigridConfig":
        return dataclasses.replace(self, **kw)


# --------------------------------------------------------------------------
# hierarchy construction
# --------------------------------------------------------------------------

def _sample_coarse(field, fine: Grid, coarse: Grid):
    """Injection-sample a padded fine node field onto the coarse grid."""
    if field is None or jnp.ndim(field) == 0:
        return field
    c = field[0 : fine.nx : 2, 0 : fine.ny : 2]
    out = jnp.zeros(coarse.shape_padded, field.dtype)
    return out.at[: coarse.nx, : coarse.ny].set(c[: coarse.nx, : coarse.ny])


def build_hierarchy(
    grid: Grid,
    spec: BoundarySpec = BoundarySpec(),
    *,
    a=None,
    lam=0.0,
    policy: Optional[PrecisionPolicy] = None,
    dtype=None,
    domain=None,
    cfg: MultigridConfig = MultigridConfig(),
) -> Tuple[Level, ...]:
    """Build the level tuple by repeated 2:1 coarsening + rediscretization.

    Coefficient fields (``a``, array-valued ``lam``) are injection-sampled to
    each coarse grid and the operator rebuilt there (rediscretization — the
    reference does the same implicitly by reusing the analytic stencil,
    reference multigrid.py:135-182).
    """
    grids = [grid]
    while grids[-1].can_coarsen() and len(grids) < cfg.max_levels:
        grids.append(grids[-1].coarsen())

    if policy is not None:
        dtypes = policy.level_dtypes(len(grids))
    else:
        dtypes = (as_dtype(dtype if dtype is not None else jnp.float32),) * len(grids)

    if cfg.coarsening not in ("rediscretize", "galerkin"):
        raise ValueError(f"unknown coarsening {cfg.coarsening!r}")

    levels = []
    a_l, lam_l = a, lam
    st_hi = None  # high-precision operator chain for Galerkin RAP
    rap_dt = jnp.dtype(cfg.galerkin_dtype)
    for i, (g, dt) in enumerate(zip(grids, dtypes)):
        if i == 0 or cfg.coarsening == "rediscretize":
            st = st_mod.make_stencil(g, spec, a=a_l, lam=lam_l, dtype=dt)
            if i == 0 and cfg.coarsening == "galerkin":
                st_hi = st_mod.make_stencil(g, spec, a=a_l, lam=lam_l,
                                            dtype=rap_dt)
        else:
            # Galerkin: A_c = R A P of the previous level's operator
            # (ops/galerkin.py) — the chain stays at cfg.galerkin_dtype so
            # roundoff does not compound down the hierarchy
            from ..ops import galerkin as galerkin_mod

            st_hi = galerkin_mod.galerkin_coarse_stencil(
                st_hi, grids[i - 1], g, spec, domain=domain, dtype=rap_dt,
                restriction=cfg.restriction, prolongation=cfg.prolongation,
            )
            st = st_hi.astype(dt)
        levels.append(Level(stencil=st, grid=g, spec=spec, dtype=np.dtype(dt),
                            domain=domain))
        if g.can_coarsen():
            gc = g.coarsen()
            a_l = _sample_coarse(a_l, g, gc)
            lam_l = _sample_coarse(lam_l, g, gc)
    return tuple(levels)


# --------------------------------------------------------------------------
# cycles
# --------------------------------------------------------------------------

def _smooth(lev: Level, u, f, cfg: MultigridConfig, sweeps: int,
            post: bool = False):
    if sweeps <= 0:
        return u
    from ..ops import dispatch

    method = cfg.smoother
    if post and cfg.symmetric and method in ("rbgs", "gauss_seidel",
                                             "red_black", "sor"):
        method = "rbgs_rev"  # adjoint color order -> symmetric cycle
    return dispatch.smooth(
        lev.stencil, u, f, lev,
        method=method, sweeps=sweeps, omega=cfg.omega, backend=cfg.backend,
    )


def _cycle(levels: Tuple[Level, ...], u, f, lvl: int, cfg: MultigridConfig,
           cycle_type: str, constrain=None):
    lev = levels[lvl]
    unknown = lev.unknown
    if constrain is None:
        from ..ops import dispatch

        if dispatch.tail_ok(levels, lvl, cfg, cycle_type):
            # whole remaining V-recursion fused into ONE Pallas kernel
            # (ops/pallas_kernels/tail.py): zero HBM traffic below this level
            return dispatch.tail_vcycle(levels, lvl, u, f, cfg)
    if lvl == len(levels) - 1:
        # coarsest: RB-GS to (near-)exactness; exact in one sweep when a
        # single interior unknown remains.
        coarse_cfg = cfg.replace(smoother="rbgs", omega=1.0)
        return _smooth(lev, u, f, coarse_cfg, cfg.coarse_sweeps)

    u = _smooth(lev, u, f, cfg, cfg.pre_sweeps)
    sync = lev.sync
    nxt = levels[lvl + 1]
    from ..ops import dispatch

    fused = constrain is None and dispatch.transfer_fused_ok(lev, nxt, cfg)
    if fused:
        # Pallas kernel: fc = R(f - A u) in one HBM pass (the intermediate
        # fine residual never materializes) — ops/pallas_kernels/transfer.py
        fc = dispatch.residual_restrict(lev, nxt, u, f)
    else:
        r = st_mod.residual(lev.stencil, u, f, unknown, sync)
    from ..core.bc import BCKind

    wrap = (lev.spec.west.kind == BCKind.PERIODIC,
            lev.spec.south.kind == BCKind.PERIODIC)
    boundary = "zero" if lev.spec.plain else "reflect"
    if not fused:
        if any(wrap):
            r = sync(r)  # wrap ghosts feed the restriction windows at the seam
        fc = transfer.restrict(
            r, nxt.grid.nx, nxt.grid.ny, nxt.grid.shape_padded,
            method=cfg.restriction, boundary=boundary, dtype=nxt.dtype,
            wrap=wrap,
        )
    if constrain is not None:
        fc = constrain(fc, nxt)
    if boundary == "reflect":
        # 'reflect' fills every ring; zero the Dirichlet-side rings
        fc = jnp.where(nxt.unknown, fc, jnp.zeros((), fc.dtype))
    ec = jnp.zeros(nxt.grid.shape_padded, nxt.dtype)

    branch = cycle_type if lvl + 1 < cfg.w_depth else "V"
    if cycle_type == "V" or branch == "V":
        ec = _cycle(levels, ec, fc, lvl + 1, cfg, "V", constrain)
    elif cycle_type == "W":
        ec = _cycle(levels, ec, fc, lvl + 1, cfg, "W", constrain)
        ec = _cycle(levels, ec, fc, lvl + 1, cfg, "W", constrain)
    elif cycle_type == "F":
        # F-cycle: an F-recursion followed by a V-recursion
        ec = _cycle(levels, ec, fc, lvl + 1, cfg, "F", constrain)
        ec = _cycle(levels, ec, fc, lvl + 1, cfg, "V", constrain)
    else:
        raise ValueError(f"unknown cycle {cycle_type!r}")

    if fused:
        # Pallas kernel: u += P ec on fine unknowns in one HBM pass
        u = dispatch.prolong_correct(lev, nxt, ec, u)
    else:
        if any(wrap):
            ec = nxt.sync(ec)  # coarse dup must mirror node 0 before interp
        e = transfer.prolong(
            ec, nxt.grid.nx, nxt.grid.ny, lev.grid.nx, lev.grid.ny,
            lev.grid.shape_padded, method=cfg.prolongation, dtype=lev.dtype,
        )
        if constrain is not None:
            e = constrain(e, lev)
        u = jnp.where(unknown, u + e, u)
    u = _smooth(lev, u, f, cfg, cfg.post_sweeps, post=True)
    return u


def mg_cycle(levels: Tuple[Level, ...], u, f, cfg: MultigridConfig = MultigridConfig(),
             constrain=None):
    """One multigrid cycle on the finest level (pure, jittable).

    ``constrain`` optionally maps (array, Level) -> array to inject sharding
    constraints per level (see parallel.distributed)."""
    return _cycle(levels, u, f, 0, cfg, cfg.cycle, constrain)


def fmg(levels: Tuple[Level, ...], f, cfg: MultigridConfig = MultigridConfig(),
        cycles_per_level: int = 1, constrain=None):
    """Full multigrid initialization (reference advanced_multigrid.py:626-683):
    restrict the RHS to every level, solve coarsest, prolong + cycle upward.

    ``constrain`` (array, Level) -> array keeps every per-level array sharded
    under GSPMD, matching mg_cycle's hook."""
    _c = constrain if constrain is not None else (lambda a, lev: a)
    rhs = [_c(f.astype(levels[0].dtype), levels[0])]
    for lvl in range(len(levels) - 1):
        nxt = levels[lvl + 1]
        rhs.append(
            _c(transfer.restrict(
                rhs[-1], nxt.grid.nx, nxt.grid.ny, nxt.grid.shape_padded,
                method=cfg.restriction, boundary="inject", dtype=nxt.dtype,
            ), nxt)
        )
    lev = levels[-1]
    u = jnp.zeros(lev.grid.shape_padded, lev.dtype)
    u = _cycle(levels, u, rhs[-1], len(levels) - 1, cfg, "V", constrain)
    for lvl in range(len(levels) - 2, -1, -1):
        lev = levels[lvl]
        u = _c(transfer.prolong(
            u, levels[lvl + 1].grid.nx, levels[lvl + 1].grid.ny,
            lev.grid.nx, lev.grid.ny, lev.grid.shape_padded,
            method=cfg.prolongation, dtype=lev.dtype,
        ), lev)
        for _ in range(cycles_per_level):
            u = _cycle(levels, u, rhs[lvl], lvl, cfg, cfg.cycle, constrain)
    return u


# --------------------------------------------------------------------------
# outer solve
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "use_fmg", "constrain"))
def _solve_jit(levels, f, u0, cfg: MultigridConfig, use_fmg: bool,
               constrain=None):
    lev0 = levels[0]
    unknown = lev0.unknown
    hx, hy = lev0.grid.hx, lev0.grid.hy
    f = f.astype(lev0.dtype)
    u = u0.astype(lev0.dtype)

    fnorm = norms.masked_scaled_l2(f, unknown, hx, hy)
    sync0 = lev0.sync
    # relative tolerance scale: max(||f||, ||r(u0)||) — for boundary-driven
    # problems (f = 0, e.g. the harmonic corner/L-shaped benchmarks) ||f||
    # alone would make the target unreachable. Measured BEFORE any FMG start.
    r_init = st_mod.residual(lev0.stencil, u, f, unknown, sync0)
    scale = jnp.maximum(fnorm, norms.scaled_l2(r_init, hx, hy))
    tol_eff = jnp.where(
        jnp.asarray(cfg.rtol), cfg.tol * jnp.maximum(scale, 1e-300), cfg.tol
    )

    if use_fmg:
        u = fmg(levels, f, cfg, constrain=constrain)

    r0 = st_mod.residual(lev0.stencil, u, f, unknown, sync0)
    rnorm0 = norms.scaled_l2(r0, hx, hy)
    hist = jnp.full((cfg.max_iterations + 1,), jnp.nan, jnp.float64)
    hist = hist.at[0].set(rnorm0)

    def cond(carry):
        u, k, rnorm, hist = carry
        return (rnorm > tol_eff) & (k < cfg.max_iterations)

    def body(carry):
        u, k, rnorm, hist = carry
        u = mg_cycle(levels, u, f, cfg, constrain)
        r = st_mod.residual(lev0.stencil, u, f, unknown, sync0)
        rnorm = norms.scaled_l2(r, hx, hy)
        hist = hist.at[k + 1].set(rnorm)
        return (u, k + 1, rnorm, hist)

    u, k, rnorm, hist = jax.lax.while_loop(
        cond, body, (u, jnp.asarray(0, jnp.int32), rnorm0, hist)
    )
    if sync0 is not None:
        u = sync0(u)  # leave periodic duplicate nodes consistent for output
    # pack every statistic into ONE f64 buffer: each device->host readback
    # costs a full tunnel round-trip (~25 ms measured), so the host wrapper
    # must fetch exactly one array.
    stats = jnp.stack([
        k.astype(jnp.float64), rnorm, rnorm0, fnorm,
        (rnorm <= tol_eff).astype(jnp.float64),
    ])
    return u, jnp.concatenate([stats, hist])


def _unpack_info(packed: np.ndarray) -> Dict[str, Any]:
    """Host-side decode of the packed stats buffer (single readback)."""
    it = int(packed[0])
    hist = packed[5:][: it + 1]
    return {
        "iterations": it,
        "residual_norm": float(packed[1]),
        "initial_residual_norm": float(packed[2]),
        "rhs_norm": float(packed[3]),
        "converged": bool(packed[4]),
        "history": hist,
        "convergence_factor": convergence_factor(hist),
    }


def convergence_factor(history: np.ndarray) -> float:
    """Asymptotic factor: mean of the last <=5 residual ratios
    (reference solvers/base.py:47-64)."""
    h = np.asarray(history, dtype=np.float64)
    h = h[np.isfinite(h) & (h > 0)]
    if h.size < 2:
        return float("nan")
    ratios = h[1:] / h[:-1]
    return float(np.mean(ratios[-5:]))


def mg_solve(
    levels: Tuple[Level, ...],
    f,
    u0=None,
    cfg: MultigridConfig = MultigridConfig(),
    *,
    use_fmg: bool = False,
    constrain=None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Solve A u = f by repeated multigrid cycles.

    ``f`` and ``u0`` are padded arrays; ``u0`` carries Dirichlet values on its
    boundary ring (see models.problems). Returns the padded solution and an
    info dict (iterations, residual history, convergence factor, ...).
    """
    if u0 is None:
        u0 = jnp.zeros(levels[0].grid.shape_padded, levels[0].dtype)
    u, packed = _solve_jit(levels, f, u0, cfg, use_fmg, constrain)
    return u, _unpack_info(np.asarray(packed))
