"""Pallas TPU fused coarse-tail kernel: the entire V-cycle below the strip
levels in ONE kernel launch.

Motivation (measured, scripts/cycle_breakdown.py): at 1025^2 the fine three
levels' smoothing/transfer kernels account for ~60% of the V(2,2) cycle; the
rest is ~40 XLA launches on levels <= 129^2 whose arrays are tiny (<= 140 KB)
— pure launch/latency cost, the TPU analogue of the reference's kernel-launch
overhead on coarse grids (reference gpu/multi_gpu_solver.py coarse levels).
Every tail level fits VMEM simultaneously (sum over levels of u,f,temps
<= ~1 MB), so the whole recursion — pre/post smoothing, fused
residual+restriction, prolongation+correction, coarsest-level solve — runs as
one Pallas kernel with zero HBM traffic beyond reading u,f and writing u on
the entry level.

Reuses the shared window helpers: `_sweep_body` (ops/pallas_kernels/smooth.py)
and `_rr_window`/`_pc_window` (ops/pallas_kernels/transfer.py) with the
whole level as a single window (gi0 = woff = crow0 = 0). Constant-coefficient
all-Dirichlet fp32/bf16 fast path only (compute in fp32), mirroring the other
kernels; routing in ops/dispatch.py + solvers/multigrid.py.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .smooth import _sweep_body
from .transfer import _pc_window, _rr_window

# entry-level cap: the whole tail (u, f per level + sweep temporaries) must
# stay well inside the 16 MB scoped-VMEM budget; 256 KB entry => ~1.5 MB
TAIL_MAX_ENTRY_BYTES = 256 * 1024


def _masks(nx, ny, shape):
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    unknown = (i > 0) & (i < nx - 1) & (j > 0) & (j < ny - 1)
    red = ((i + j) & 1) == 0  # & not %: Mosaic mod-lowering recurses
    return unknown, red


def _smooth_n(u, f, stp, nx, ny, sweeps, omega, method, reverse=False):
    if sweeps <= 0:
        return u
    c, w, e, s, n = stp
    unknown, red = _masks(nx, ny, u.shape)
    if reverse:
        red = ~red  # black-then-red: adjoint order for symmetric cycles
    om = jnp.asarray(omega, u.dtype)
    sweep = _sweep_body(f, unknown, red, c, w, e, s, n, om, method)
    return jax.lax.fori_loop(0, sweeps, lambda _, u: sweep(u), u)


def _tail_kernel(u_ref, f_ref, p_ref, o_ref, *, meta, pre, post, omega,
                 method, coarse_sweeps, symmetric):
    """meta: tuple of (nx, ny, px, py) per tail level, finest first."""
    L = len(meta)
    stps = [tuple(p_ref[l, k] for k in range(5)) for l in range(L)]

    def vcycle(lvl, u, f):
        nx, ny, px, py = meta[lvl]
        stp = stps[lvl]
        if lvl == L - 1:
            return _smooth_n(u, f, stp, nx, ny, coarse_sweeps, 1.0, "rbgs")
        u = _smooth_n(u, f, stp, nx, ny, pre, omega, method)
        ncx, ncy, pxc, pyc = meta[lvl + 1]
        fc = _rr_window(u, f, stp, 0, 0, pxc, nx, ny, ncx, ncy, 0, pyc)
        ec = vcycle(lvl + 1, jnp.zeros_like(fc), fc)
        u = _pc_window(ec, u, 0, 0, nx, ny)
        return _smooth_n(u, f, stp, nx, ny, post, omega, method,
                         reverse=symmetric)

    u = u_ref[:].astype(jnp.float32)
    f = f_ref[:].astype(jnp.float32)
    o_ref[:] = vcycle(0, u, f).astype(o_ref.dtype)


def _tail_kernel_var(*refs, meta, pre, post, omega, method, coarse_sweeps,
                     symmetric):
    """Variable-coefficient tail: the five coefficient planes per level are
    VMEM-resident inputs (they are tiny below 129^2 — the 513^2 streamed-
    coefficient loss recorded for VARCOEF_AUTO does not apply to these
    dispatch-bound levels). refs: u, f, 5*L coefficient planes, out."""
    L = len(meta)
    u_ref, f_ref = refs[0], refs[1]
    o_ref = refs[-1]
    stps = []
    for l in range(L):
        nx, ny, px, py = meta[l]
        c, w, e, s, n = (r[:].astype(jnp.float32)
                         for r in refs[2 + 5 * l: 7 + 5 * l])
        unknown, _ = _masks(nx, ny, c.shape)
        # padding/boundary nodes can hold c == 0; guard the reciprocal
        # (masked nodes never use the value) — cf. smooth._smooth_kernel_var
        c = jnp.where(unknown, c, jnp.ones((), jnp.float32))
        stps.append((c, w, e, s, n))

    def vcycle(lvl, u, f):
        nx, ny, px, py = meta[lvl]
        stp = stps[lvl]
        if lvl == L - 1:
            return _smooth_n(u, f, stp, nx, ny, coarse_sweeps, 1.0, "rbgs")
        u = _smooth_n(u, f, stp, nx, ny, pre, omega, method)
        ncx, ncy, pxc, pyc = meta[lvl + 1]
        fc = _rr_window(u, f, stp, 0, 0, pxc, nx, ny, ncx, ncy, 0, pyc)
        ec = vcycle(lvl + 1, jnp.zeros_like(fc), fc)
        u = _pc_window(ec, u, 0, 0, nx, ny)
        return _smooth_n(u, f, stp, nx, ny, post, omega, method,
                         reverse=symmetric)

    u = u_ref[:].astype(jnp.float32)
    f = f_ref[:].astype(jnp.float32)
    o_ref[:] = vcycle(0, u, f).astype(o_ref.dtype)


def tail_vcycle_var(
    stencils: Sequence,            # Stencils with 2-d leaves, finest first
    u,
    f,
    *,
    meta: Tuple[Tuple[int, int, int, int], ...],  # (nx, ny, px, py) per level
    pre: int,
    post: int,
    omega: float,
    method: str = "rbgs",
    coarse_sweeps: int = 32,
    symmetric: bool = False,
    interpret: bool = False,
):
    """Variable-coefficient fused coarse tail: one V(pre,post) cycle over the
    whole tail with the five coefficient planes of EVERY level VMEM-resident.

    Unlike the streamed-coefficient strip smoother (whose 'auto' gate is off
    — the coefficient traffic loses at 513^2), the tail levels are tiny and
    dispatch-bound: varcoef/Helmholtz-with-array-coefficient cycles
    otherwise pay the same ~60 us XLA coarse recursion as the scalar path
    (round-3 VERDICT item 3). Scalar leaves are broadcast, so mixed
    scalar/array hierarchies work. Routing: ops/dispatch.tail_ok
    (TAILVAR_AUTO gate) + dispatch.tail_vcycle."""
    L = len(meta)
    if L != len(stencils):
        raise ValueError("one stencil per tail level required")
    coef_inputs = []
    for st, m in zip(stencils, meta):
        px, py = int(m[2]), int(m[3])
        for x in (st.c, st.w, st.e, st.s, st.n):
            coef_inputs.append(
                jnp.broadcast_to(jnp.asarray(x, jnp.float32), (px, py)))
    kernel = partial(
        _tail_kernel_var, meta=tuple(tuple(int(x) for x in m) for m in meta),
        pre=int(pre), post=int(post), omega=float(omega), method=method,
        coarse_sweeps=int(coarse_sweeps), symmetric=bool(symmetric),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + 5 * L),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(u, f, *coef_inputs)


def tail_vcycle(
    stencils: Sequence,            # scalar Stencils, finest tail level first
    u,
    f,
    *,
    meta: Tuple[Tuple[int, int, int, int], ...],  # (nx, ny, px, py) per level
    pre: int,
    post: int,
    omega: float,
    method: str = "rbgs",
    coarse_sweeps: int = 32,
    symmetric: bool = False,
    interpret: bool = False,
):
    """One V(pre,post) cycle over the whole coarse tail in a single kernel.

    Matches the XLA `_cycle` recursion (solvers/multigrid.py) for the
    constant-stencil all-Dirichlet fp32 configuration: same sweep bodies,
    same fused-window transfer numerics (full weighting / bilinear)."""
    L = len(meta)
    if L != len(stencils):
        raise ValueError("one stencil per tail level required")
    params = jnp.stack([
        jnp.stack([jnp.asarray(x, jnp.float32)
                   for x in (st.c, st.w, st.e, st.s, st.n)])
        for st in stencils
    ])  # (L, 5)
    kernel = partial(
        _tail_kernel, meta=tuple(tuple(int(x) for x in m) for m in meta),
        pre=int(pre), post=int(post), omega=float(omega), method=method,
        coarse_sweeps=int(coarse_sweeps), symmetric=bool(symmetric),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 5), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(u, f, params)
