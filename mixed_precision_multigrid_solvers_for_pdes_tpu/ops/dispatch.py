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

# below this, per-call kernel-launch overhead rivals the work itself and the
# whole level is a handful of XLA fusions anyway (coarse levels)
_MIN_PALLAS_BYTES = 64 * 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pallas_smooth_ok(stencil, u, lev, backend: str, method: str = "rbgs") -> bool:
    if method not in ("jacobi", "rbgs", "gauss_seidel", "red_black", "sor"):
        return False  # line/ADI smoothers are XLA-only (tridiagonal_solve)
    if backend == "xla":
        return False
    if backend == "auto" and not _on_tpu():
        return False
    if jnp.ndim(stencil.c) != 0:
        return False  # variable-coefficient / Neumann path: XLA for now
    if u.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return u.size * u.dtype.itemsize >= _MIN_PALLAS_BYTES


def smooth(stencil, u, f, lev, *, method: str, sweeps: int, omega: float,
           backend: str = "auto"):
    sync = lev.sync
    if sync is None and _pallas_smooth_ok(stencil, u, lev, backend, method):
        from .pallas_kernels import smooth as psmooth

        nbytes = u.size * u.dtype.itemsize
        if nbytes <= psmooth.WHOLE_GRID_BYTES:
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
