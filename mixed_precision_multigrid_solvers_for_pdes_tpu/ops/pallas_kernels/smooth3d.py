"""Pallas TPU 3D red-black Gauss-Seidel: rolling-plane pipeline kernel.

3D sibling of ops/pallas_kernels/smooth.py, covering the smoothing work the
reference never shipped in 3D at all (its 3D solvers are stubs, reference
applications/poisson_solver.py:483-557; its CUDA smoothers
gpu/cuda_kernels.py:87-275 are 2D-only).

The XLA RB-GS path pays ~6 HBM passes per sweep in 3D (red: read u, f,
write u; black: again). This kernel streams x-planes (the leading,
untiled axis) through VMEM ring buffers and computes BOTH colors in one
pass with a two-stage software pipeline:

    step i:  DMA-in plane i+1 | red-update plane i-1 (old planes i-2..i)
             | black-update plane i-2 (red-updated planes i-3..i-1)
             | DMA-out plane i-2

so each sweep moves exactly (u in) + (f in) + (u out) = 3 HBM passes — and
the ordering is EXACTLY standard RB-GS (red from old values, black from
red-updated), bit-matching the XLA smoother at fp32. No redundant compute:
unlike halo-recompute tiling, every plane is updated once.

Planes too wide for VMEM are split into y-strips (static python-unrolled,
offsets multiples of 8 = the sublane tiling) with an 8-row halo re-read —
the only redundant traffic (wy/by, e.g. 1.15x at 513^3).

Multi-sweep runs as chained single-sweep kernel calls (still 3 passes per
sweep vs 6). Constant-coefficient all-Dirichlet rectangles only; variable
coefficients / Neumann / Robin / periodic stay on the XLA path via
solvers/multigrid3d.py gating. In-kernel index math is int32 (Mosaic);
dynamic DMA offsets only ever index the untiled leading axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stencil3d import Stencil3D

# ring buffers: (12 planes + ~6 compute temporaries) x (wy, pz) fp32 must
# stay well under the ~16 MB scoped-VMEM limit
_RING_BUDGET_BYTES = 6_000_000


def _choose_ystrip(py: int, pz: int, itemsize: int, target: int = 128) -> int:
    """Largest multiple-of-8 divisor of py with by <= target (VMEM-capped);
    py is always a multiple of 8 (Grid3D padding)."""
    d = py // 8
    best = 8
    cap = max(target, 8)
    for k in range(1, d + 1):
        if d % k == 0:
            by = 8 * k
            wy = min(by + 16, py)
            if by <= cap and 12 * wy * pz * max(itemsize, 4) <= _RING_BUDGET_BYTES:
                best = by
    return best


def _pipeline_kernel(p_ref, u_hbm, f_hbm, o_hbm, uo, ur, ff, ob,
                     in_sems, out_sems, *, px, py, pz, nx, ny, nz,
                     omega, first_red, strips, u_cast, f_cast):
    """One RB-GS sweep (both colors) over the whole (px, py, pz) array.

    ``strips``: static tuple of (y0, wy0, wy, by) y-windows. ``u_cast`` /
    ``f_cast``: input dtypes differ from fp32 (cast on load)."""
    compute = jnp.float32
    c, w, e, s, n, b, t = (p_ref[0, k] for k in range(7))
    inv_c = 1.0 / c
    om = jnp.asarray(omega, compute)

    for (y0, wy0, wy, by) in strips:
        off = y0 - wy0  # static: 0 (first strip), 8 (middle), 16 (last)

        gj = wy0 + jax.lax.broadcasted_iota(jnp.int32, (wy, pz), 0)
        gk = jax.lax.broadcasted_iota(jnp.int32, (wy, pz), 1)
        in_plane = (gj > 0) & (gj < ny - 1) & (gk > 0) & (gk < nz - 1)
        parity_jk = (gj + gk) & 1

        def in_dma(idx):
            # static index math stays python-int (Mosaic's load/DMA lowering
            # rejects raw numpy scalars); traced values pass through as-is
            slot = idx & 3
            return (
                pltpu.make_async_copy(
                    u_hbm.at[idx, pl.ds(wy0, wy), :],
                    uo.at[slot, pl.ds(0, wy), :],
                    in_sems.at[slot, _np.int32(0)]),
                pltpu.make_async_copy(
                    f_hbm.at[idx, pl.ds(wy0, wy), :],
                    ff.at[slot, pl.ds(0, wy), :],
                    in_sems.at[slot, _np.int32(1)]),
            )

        def out_dma(p):
            slot = p & 1
            return pltpu.make_async_copy(
                ob.at[slot, pl.ds(0, by), :],
                o_hbm.at[p, pl.ds(y0, by), :],
                out_sems.at[slot])

        def masks(q, want_first):
            unknown = ((q > 0) & (q < nx - 1)) & in_plane
            red = ((q + parity_jk) & 1) == 0
            color = red if (want_first == first_red) else ~red
            return unknown, color

        def load(ring, q, cast):
            v = ring[q & 3, pl.ds(0, wy), :]
            return v.astype(compute) if cast else v

        def update(um, u0, up, fq, mask):
            nb = (w * um + e * up
                  + s * jnp.roll(u0, 1, 0) + n * jnp.roll(u0, -1, 0)
                  + b * jnp.roll(u0, 1, 1) + t * jnp.roll(u0, -1, 1))
            u_gs = (fq + nb) * inv_c
            return jnp.where(mask, u0 + om * (u_gs - u0), u0)

        for d in in_dma(_np.int32(0)):
            d.start()

        def body(i):
            @pl.when(i + 1 <= px - 1)
            def _():
                for d in in_dma(i + 1):
                    d.start()

            @pl.when(i <= px - 1)
            def _():
                for d in in_dma(i):
                    d.wait()

            # stage 1 (first color) on plane q = i-1, from OLD planes
            @pl.when((i >= 1) & (i <= px))
            def _():
                q = i - 1
                unknown, m1 = masks(q, True)
                u0 = load(uo, q, u_cast)
                res = update(load(uo, q - 1, u_cast), u0,
                             load(uo, q + 1, u_cast),
                             load(ff, q, f_cast), m1 & unknown)
                ur[q & 3, pl.ds(0, wy), :] = res

            # stage 2 (second color) on plane p = i-2, from stage-1 planes
            @pl.when(i >= 2)
            def _():
                p = i - 2

                @pl.when(p >= 2)
                def _():
                    out_dma(p - 2).wait()

                unknown, m2 = masks(p, False)
                u0 = load(ur, p, False)
                res = update(load(ur, p - 1, False), u0,
                             load(ur, p + 1, False),
                             load(ff, p, f_cast), m2 & unknown)
                ob[p & 1, pl.ds(0, by), :] = (
                    res[off:off + by].astype(ob.dtype))
                out_dma(p).start()

            return (i + _np.int32(1)).astype(jnp.int32)

        # while_loop with an int32 counter (fori would be i64 under x64,
        # which Mosaic's convert-lowering cannot digest — see smooth.py)
        jax.lax.while_loop(lambda i: i < px + 2, body, _np.int32(0))

        # drain the last two output copies
        out_dma(_np.int32(px - 2)).wait()
        out_dma(_np.int32(px - 1)).wait()


def rbgs_planes(
    st: Stencil3D,
    u,
    f,
    *,
    nx: int,
    ny: int,
    nz: int,
    sweeps: int = 2,
    omega: float = 1.0,
    reverse: bool = False,
    ystrip: int = 128,
    interpret: bool = False,
):
    """``sweeps`` red-black GS sweeps via the rolling-plane pipeline.

    Each sweep is one kernel call (3 HBM passes); numerics match
    solvers/multigrid3d.smooth3d(method='rbgs') exactly at fp32.
    ``reverse=True`` runs black-then-red (symmetric post-sweeps)."""
    if jnp.ndim(st.c) != 0:
        raise ValueError("rbgs_planes requires a constant-coefficient stencil")
    px, py, pz = u.shape
    if px < 4:
        raise ValueError("pipeline needs px >= 4")
    by = _choose_ystrip(py, pz, u.dtype.itemsize, ystrip)
    strips = []
    for y0 in range(0, py, by):
        wy = min(by + 16, py)
        wy0 = min(max(y0 - 8, 0), py - wy)
        strips.append((y0, wy0, wy, by))
    strips = tuple(strips)
    wy_max = max(s[2] for s in strips)
    params = jnp.stack(
        [jnp.asarray(x, jnp.float32)
         for x in (st.c, st.w, st.e, st.s, st.n, st.b, st.t)]
    ).reshape(1, 7)
    kernel = partial(
        _pipeline_kernel, px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz,
        omega=float(omega), first_red=not reverse, strips=strips,
        u_cast=u.dtype != jnp.float32, f_cast=f.dtype != jnp.float32,
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[
            pl.BlockSpec((1, 7), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, wy_max, pz), u.dtype),      # old planes
            pltpu.VMEM((4, wy_max, pz), jnp.float32),  # stage-1 planes
            pltpu.VMEM((4, wy_max, pz), f.dtype),      # f planes
            pltpu.VMEM((2, by, pz), u.dtype),          # out staging
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    for _ in range(int(sweeps)):
        u = call(params, u, f)
    return u
