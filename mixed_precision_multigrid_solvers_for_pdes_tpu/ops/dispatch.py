"""Backend dispatch between the XLA reference path and Pallas TPU kernels.

The Pallas fast path (ops/pallas_kernels) applies when:
- running on TPU with backend 'auto', or backend 'pallas' is forced,
- the stencil is on the scalar (constant-coefficient, all-Dirichlet) fast
  path (no periodic sync),
- dtype is fp32/bf16 and the level is big enough for kernel-launch cost to
  amortize.

Routing is by measured marginal cost (scripts/kernel_microbench.py, v5e,
two-K protocol, per RB-GS sweep, fp32):

    size    XLA      whole-grid kernel    strip kernel
    513^2    9.3 us       2.7 us            (covered by whole-grid)
    1025^2  31.1 us       (exceeds VMEM)    17.1 us
    2049^2 160.2 us       (exceeds VMEM)    70.9 us

Round 1 concluded the kernels lose to XLA; that measurement was contaminated
by the ~27 ms fixed per-execution cost of the axon tunnel. The XLA
implementations remain the numerical ground truth in tests and cover every
configuration the kernels gate out (variable coefficients, Neumann/Robin/
periodic, line smoothers, f64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import smooth as smooth_mod
from .stencil import Stencil9

# below this, per-call kernel-launch overhead rivals the work itself and the
# whole level is a handful of XLA fusions anyway (coarse levels)
_MIN_PALLAS_BYTES = 64 * 1024

# fused transfer kernels pay two kernel launches per cycle level; measured
# marginal cost per residual+restrict+prolong+correct pass, fp32 (two-K
# protocol, v5e): 257^2 XLA 9.3 us vs fused 2.8; 513^2 28.9 vs 10.9;
# 1025^2 113 vs 29; 2049^2 561 vs 158. Below ~256 KB the launch cost and
# XLA's fusion of tiny levels make the kernels a wash.
_MIN_TRANSFER_BYTES = 256 * 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# Streamed-coefficient Pallas smoothing: three chip sessions at 513^2 —
# round 3 (pre-hardening protocol, later proven unreliable): kernel loses
# 91 vs 31 us; round 4 (guarded readback-synced): kernel wins 26 vs 780;
# round 5 (guarded, healthy tunnel): kernel wins 16.0 vs 20.0 us, and the
# varcoef fused transfer pair wins 30.9 vs 39.9 us under the same gate
# (reports/gate_microbench.json varxfer rows, ADVICE r4 medium). Both
# guarded sessions agree at 513^2, so the gate admits it
# (>= _VARCOEF_MIN_BYTES = 1 MB); 257^2 and below stay on XLA (tiny
# levels are fusion/dispatch-bound).
VARCOEF_AUTO = True
_VARCOEF_MIN_BYTES = 1024 * 1024


def _pallas_smooth_ok(stencil, u, lev, backend: str, method: str = "rbgs") -> bool:
    if method not in ("jacobi", "rbgs", "gauss_seidel", "red_black", "sor"):
        return False  # line/ADI smoothers are XLA-only (tridiagonal_solve)
    if isinstance(stencil, Stencil9):
        return False  # Galerkin 9-point coarse operators: XLA path only
    if backend == "xla":
        return False
    if backend == "auto" and not _on_tpu():
        return False
    if jnp.ndim(stencil.c) != 0:
        # variable-coefficient path: coefficient planes stream through VMEM
        # windows. Requires the iota-built interior mask, i.e. a plain
        # all-Dirichlet rectangle (Neumann/Robin move unknowns onto the
        # boundary; domain masks carve the interior) — those stay on XLA.
        if backend == "auto" and (
                not VARCOEF_AUTO
                or u.size * u.dtype.itemsize < _VARCOEF_MIN_BYTES):
            return False
        if getattr(lev, "domain", None) is not None:
            return False
        if not lev.spec.all_dirichlet:
            return False
    if u.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return u.size * u.dtype.itemsize >= _MIN_PALLAS_BYTES


def smooth(stencil, u, f, lev, *, method: str, sweeps: int, omega: float,
           backend: str = "auto"):
    sync = lev.sync
    if sync is None and _pallas_smooth_ok(stencil, u, lev, backend, method):
        from .pallas_kernels import smooth as psmooth

        nbytes = u.size * u.dtype.itemsize
        ceiling = (psmooth.WHOLE_GRID_BYTES_VAR if jnp.ndim(stencil.c) != 0
                   else psmooth.WHOLE_GRID_BYTES)
        if nbytes <= ceiling:
            return psmooth.multisweep(
                stencil, u, f,
                nx=lev.grid.nx, ny=lev.grid.ny,
                method=method, sweeps=sweeps, omega=omega,
            )
        return psmooth.multisweep_strips(
            stencil, u, f,
            nx=lev.grid.nx, ny=lev.grid.ny,
            method=method, sweeps=sweeps, omega=omega,
        )
    from ..core.bc import BCKind

    cyclic_axes = (
        lev.grid.nx - 1 if lev.spec.west.kind == BCKind.PERIODIC else 0,
        lev.grid.ny - 1 if lev.spec.south.kind == BCKind.PERIODIC else 0,
    )
    return smooth_mod.smooth(
        stencil, u, f, lev.unknown, method=method, sweeps=sweeps, omega=omega,
        sync=sync, cyclic_axes=cyclic_axes,
    )


# Measured on the v5e chip (scripts/kernel_microbench3d.py, two-K marginal,
# fp32, per RB-GS sweep): 129^3 XLA 526.8 us vs pipeline 100.7 (5.2x);
# 257^3 5893.7 vs 1728.5 (3.4x). Mosaic-compiled + numerics-validated on
# device (reports/hw_validate.json, rel-err 0). Gate ON for 'auto' on TPU.
# Round-4's contradictory 2939-us row (degraded session, unguarded
# protocol) did NOT reproduce in the round-5 same-session tiebreak
# (reports/smooth3d_tiebreak.json): Pallas 96.9 vs XLA 423.2 us/sweep
# (4.4x) AND whole-solve auto 2.07x at 129^3 — gate confirmed ON.
SMOOTH3D_AUTO = True


def pallas_smooth3d_ok(stencil, u, lev, backend: str, method: str) -> bool:
    """Gate for the 3D rolling-plane RB-GS kernel
    (ops/pallas_kernels/smooth3d.py): rbgs-family smoother on a
    constant-coefficient all-Dirichlet box, fp32/bf16, >= 4 x-planes,
    level big enough to amortize the launch."""
    if method not in ("rbgs", "gauss_seidel", "red_black", "sor",
                      "rbgs_rev"):
        return False
    if backend == "xla":
        return False
    if backend == "auto" and (not SMOOTH3D_AUTO or not _on_tpu()):
        return False
    if jnp.ndim(stencil.c) != 0:
        return False
    if not lev.spec.all_dirichlet:
        return False
    if u.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if u.shape[0] < 4:
        return False
    return u.size * u.dtype.itemsize >= _MIN_PALLAS_BYTES


# Measured on the v5e chip (scripts/kernel_microbench3d.py, two-K marginal,
# fp32, per residual+restrict+prolong+correct pass): 129^3 XLA 474.0 us vs
# fused pair 169.7 (2.8x); 257^3 12940.7 vs 870.1 (14.9x — the XLA chain's
# MXU decimation matmuls blow up cubically). Gate ON for 'auto' on TPU.
TRANSFER3D_AUTO = True


def transfer_fused3d_ok(lev, nxt, cfg) -> bool:
    """Gate for the fused 3D residual+restrict / prolong+correct kernels
    (ops/pallas_kernels/transfer3d.py): scalar all-Dirichlet stencil,
    fp32/bf16, >= 4 x-planes, whole (py, pz) planes within the VMEM plane
    budget, level big enough to amortize two launches."""
    backend = cfg.backend
    if backend == "xla":
        return False
    if backend == "auto" and (not TRANSFER3D_AUTO or not _on_tpu()):
        return False
    if jnp.ndim(lev.stencil.c) != 0:
        return False
    if cfg.restriction != "full_weighting":
        return False
    if not lev.spec.all_dirichlet:
        return False
    for dt in (lev.dtype, nxt.dtype):
        if jnp.dtype(dt) not in (jnp.dtype(jnp.float32),
                                 jnp.dtype(jnp.bfloat16)):
            return False
    from .pallas_kernels.transfer3d import PLANE_BUDGET_BYTES

    px, py, pz = lev.grid.shape_padded
    if px < 4 or py * pz * 4 > PLANE_BUDGET_BYTES:
        return False
    return px * py * pz * jnp.dtype(lev.dtype).itemsize >= _MIN_TRANSFER_BYTES


def _dirichlet_sides(spec):
    """Static (west, east, south, north) Dirichlet flags for the fused
    transfer kernels (False = Neumann/Robin ring: unknown + reflect fold)."""
    from ..core import bc as bc_mod
    from ..core.bc import BCKind

    return tuple(spec.side(s).kind == BCKind.DIRICHLET for s in bc_mod.SIDES)


def transfer_fused_ok(lev, nxt, cfg) -> bool:
    """True when the fused Pallas residual+restrict / prolong+correct pair
    (ops/pallas_kernels/transfer.py) may replace the XLA transfer chain in
    the cycle: 5-point stencil on a full rectangle with uniform
    (segment-free, non-periodic) sides, default transfer operators,
    fp32/bf16, level big enough to amortize two kernel launches.
    Neumann/Robin sides route through the streamed-coefficient kernel with
    per-side reflect folds (their stencils are always array-valued).
    Measured marginal cost per residual+restrict+prolong+correct pass, fp32
    (two-K protocol, v5e): 1025^2 XLA 113 us vs fused 29 us (3.9x); 2049^2
    561 vs 158 (3.5x)."""
    backend = cfg.backend
    if backend == "xla":
        return False
    if backend == "auto" and not _on_tpu():
        return False
    if isinstance(lev.stencil, Stencil9) or isinstance(nxt.stencil, Stencil9):
        return False  # Galerkin 9-point levels: XLA path only
    if jnp.ndim(lev.stencil.c) != 0:
        # variable coefficients: residual_restrict streams the five
        # coefficient planes through VMEM (prolong_correct is
        # stencil-independent). Same size-gated policy as smoothing.
        px_, py_ = lev.grid.shape_padded
        nbytes = px_ * py_ * jnp.dtype(lev.dtype).itemsize
        if backend == "auto" and (not VARCOEF_AUTO
                                  or nbytes < _VARCOEF_MIN_BYTES):
            return False
    if lev.domain is not None or getattr(nxt, "domain", None) is not None:
        return False
    if cfg.restriction != "full_weighting" or cfg.prolongation != "bilinear":
        return False
    spec = lev.spec
    if spec.any_periodic or spec.any_segments:
        return False  # wrap ghosts / non-uniform rings: XLA path
    for dt in (lev.dtype, nxt.dtype):
        if jnp.dtype(dt) not in (jnp.dtype(jnp.float32),
                                 jnp.dtype(jnp.bfloat16)):
            return False
    px, py = lev.grid.shape_padded
    return px * py * jnp.dtype(lev.dtype).itemsize >= _MIN_TRANSFER_BYTES


def residual_restrict(lev, nxt, u, f):
    """Fused fc = R(f - A u) (gate with transfer_fused_ok first)."""
    from .pallas_kernels import transfer as ptransfer

    return ptransfer.residual_restrict(
        lev.stencil, u, f,
        nxf=lev.grid.nx, nyf=lev.grid.ny,
        ncx=nxt.grid.nx, ncy=nxt.grid.ny,
        pshape_coarse=nxt.grid.shape_padded,
        out_dtype=nxt.dtype,
        sides=_dirichlet_sides(lev.spec),
    )


def prolong_correct(lev, nxt, ec, u):
    """Fused u + P ec on fine unknowns (gate with transfer_fused_ok first)."""
    from .pallas_kernels import transfer as ptransfer

    return ptransfer.prolong_correct(
        ec, u,
        ncx=nxt.grid.nx, ncy=nxt.grid.ny,
        nxf=lev.grid.nx, nyf=lev.grid.ny,
        sides=_dirichlet_sides(lev.spec),
    )


# Measured on the v5e chip (scripts/gate_microbench.py, two-K marginal):
# XLA recursion below 129^2 costs ~61 us/cycle (dispatch-bound tiny levels);
# the fused tail kernel absorbs it for ~0-29 us. Full V(2,2) at 1025^2:
# 128 us ('auto' without tail) -> 73 us with it. Gate ON for auto on TPU.
TAIL_AUTO = True

# Variable-coefficient tails (ops/pallas_kernels/tail.py::tail_vcycle_var):
# every level's five coefficient planes VMEM-resident. Unlike the streamed-
# coefficient smoother (VARCOEF_AUTO, measured loser), these levels are
# dispatch-bound and the kernel wins decisively — measured on the v5e
# (guarded two-K, scripts/gate_microbench.py, round 4): V(2,2) cycle from a
# 65^2 entry 55.4 -> 15.7 us (3.5x), from 129^2 151.5 -> 18.7 us (8.1x);
# hardware numerics validated (reports/hw_validate.json tail_vcycle_var
# rel-err 0.0). Gate ON.
#
# A 3D coarse tail was evaluated the same way and NOT built: the whole XLA
# recursion from a 33^3 entry costs ~116 us/cycle — ~1% of a 257^3 cycle —
# so a fused 3D tail has no meaningful headroom (gate_microbench
# tail3d_cycle rows record the opportunity bound).
TAILVAR_AUTO = True


def tail_ok(levels, lvl, cfg, cycle_type) -> bool:
    """True when the whole V-recursion from ``lvl`` down may be replaced by
    the single fused coarse-tail kernel (ops/pallas_kernels/tail.py):
    pure-V subtree, constant-coefficient all-Dirichlet rectangle on every
    remaining level, default transfers, rbgs/jacobi-family smoother, entry
    level small enough for full-tail VMEM residency. The kernel computes in
    fp32 throughout (>= the accuracy of the per-level-dtype XLA path)."""
    if cycle_type != "V":
        return False
    backend = cfg.backend
    if backend == "xla":
        return False
    if backend == "auto" and (not TAIL_AUTO or not _on_tpu()):
        return False
    if cfg.smoother not in ("jacobi", "rbgs", "gauss_seidel", "red_black",
                            "sor"):
        return False
    if cfg.restriction != "full_weighting" or cfg.prolongation != "bilinear":
        return False
    from .pallas_kernels.tail import TAIL_MAX_ENTRY_BYTES

    entry = levels[lvl]
    px, py = entry.grid.shape_padded
    if px * py * jnp.dtype(entry.dtype).itemsize > TAIL_MAX_ENTRY_BYTES:
        return False
    if jnp.dtype(entry.dtype) not in (jnp.dtype(jnp.float32),
                                      jnp.dtype(jnp.bfloat16)):
        return False
    varcoef = any(jnp.ndim(lev.stencil.c) != 0 for lev in levels[lvl:])
    if varcoef and backend == "auto" and not TAILVAR_AUTO:
        return False
    for lev in levels[lvl:]:
        if isinstance(lev.stencil, Stencil9):
            return False
        if lev.domain is not None:
            return False
        if not lev.spec.all_dirichlet:
            return False
    return True


def tail_vcycle(levels, lvl, u, f, cfg):
    """Run the fused coarse-tail kernel (gate with tail_ok first)."""
    from .pallas_kernels import tail as ptail

    tail = levels[lvl:]
    meta = tuple(
        (lev.grid.nx, lev.grid.ny) + tuple(lev.grid.shape_padded)
        for lev in tail
    )
    method = cfg.smoother
    if method in ("gauss_seidel", "red_black"):
        method = "rbgs"
    fn = (ptail.tail_vcycle_var
          if any(jnp.ndim(lev.stencil.c) != 0 for lev in tail)
          else ptail.tail_vcycle)
    return fn(
        [lev.stencil for lev in tail], u, f, meta=meta,
        pre=cfg.pre_sweeps, post=cfg.post_sweeps, omega=cfg.omega,
        method=method, coarse_sweeps=cfg.coarse_sweeps,
        symmetric=cfg.symmetric,
    )
