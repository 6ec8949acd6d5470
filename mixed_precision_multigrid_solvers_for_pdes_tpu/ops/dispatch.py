"""Backend dispatch between the XLA reference path and Pallas TPU kernels.

The Pallas fast path (ops/pallas_kernels) applies when:
- running on TPU with backend 'auto', or backend 'pallas' is forced,
- the level's arrays fit in VMEM (whole-grid-resident multi-sweep kernels),
- the stencil is on the scalar (constant-coefficient, all-Dirichlet) fast path.

Everything else uses the vectorized XLA implementations, which are also the
numerical ground truth in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import smooth as smooth_mod

# VMEM budget for the whole-grid-resident kernels. Empirically on v5e the
# multisweep kernel compiles up to ~2MB arrays (u, f, out, fori double-buffers
# ~6 live copies in 16MB VMEM); larger fine levels take the XLA path until the
# tiled kernel lands.
_VMEM_BUDGET = 12 * 1024 * 1024
_LIVE_COPIES = 6


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pallas_smooth_ok(stencil, u, lev, backend: str, method: str = "rbgs") -> bool:
    if method not in ("jacobi", "rbgs", "gauss_seidel", "red_black", "sor"):
        return False  # line/ADI smoothers are XLA-only (tridiagonal_solve)
    if backend in ("xla", "auto"):
        # Measured on v5e (k=64 chained cycles, dispatch overhead subtracted):
        # full-depth 1025^2 V(2,2) cycle is 2.5 ms on the XLA path vs 9.5 ms
        # with the VMEM-resident multisweep kernel — Mosaic's jnp.roll lane
        # rotations lose to XLA's fused stencil pipeline. Until the tiled
        # double-buffered kernel lands, 'auto' means XLA; 'pallas' forces the
        # kernel (kept for tests and further kernel work).
        return False
    if jnp.ndim(stencil.c) != 0:
        return False  # variable-coefficient / Neumann path: XLA for now
    if u.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    nbytes = u.size * u.dtype.itemsize
    return _LIVE_COPIES * nbytes <= _VMEM_BUDGET


def smooth(stencil, u, f, lev, *, method: str, sweeps: int, omega: float,
           backend: str = "auto"):
    sync = lev.sync
    if sync is None and _pallas_smooth_ok(stencil, u, lev, backend, method):
        from .pallas_kernels import smooth as psmooth

        return psmooth.multisweep(
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
