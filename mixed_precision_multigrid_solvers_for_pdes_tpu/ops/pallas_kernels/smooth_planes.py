"""Pallas TPU multisweep smoother on HBM-RESIDENT parity planes.

The round-4 in-kernel parity variant (smooth.py layout='parity') measured a
LOSER because every 2-sweep call paid the VMEM split/merge transposes. Here
the split cost is gone: the level-0 state arrives already as the stacked
plane array (4, hx, hy) = (ee, eo, oe, oo) (ops/planes.py, split once per
solve), and the kernel streams plane strips through VMEM, runs the
half-width no-masked-waste color updates (bit-identical bodies to
smooth._parity_sweeps), and writes plane strips back.

Per 2-sweep call the HBM traffic equals the direct kernel's (read u, f;
write u) but the VPU work halves (each color touches only its own planes
with half-width rolls) and no transposes run at all.

Same Mosaic discipline as smooth._strips_kernel: int32 index math,
8-aligned dynamic DMA row offsets, static tail window, double-buffered
windows with two-slot output drain.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stencil import Stencil

_HALO_ALIGN = 8

# whole-plane-set VMEM residency cap (u + f plane sets + temporaries)
WHOLE_PLANES_BYTES = 2_100_000


def _plane_masks_at(gp0, a_b, shape, nx, ny):
    """Unknown mask for plane (a, b): global fine (2*(gp0+i)+a, 2*j+b)."""
    a, b = a_b
    ii = gp0 + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    gi = 2 * ii + a
    gj = 2 * jj + b
    return (gi > 0) & (gi < nx - 1) & (gj > 0) & (gj < ny - 1)


def _plane_sweeps(planes, fplanes, gp0, nx, ny, stp, omega, sweeps):
    """``sweeps`` RB-GS/SOR sweeps on plane windows (row 0 = plane row
    gp0). Bit-identical arithmetic to smooth._parity_sweeps (same bodies,
    same operand order) — red = {ee, oo}, black = {eo, oe} reads fresh
    red."""
    c, w, e, s, n = stp
    inv_c = 1.0 / c
    om = omega
    shape = planes[0].shape
    m_ee = _plane_masks_at(gp0, (0, 0), shape, nx, ny)
    m_eo = _plane_masks_at(gp0, (0, 1), shape, nx, ny)
    m_oe = _plane_masks_at(gp0, (1, 0), shape, nx, ny)
    m_oo = _plane_masks_at(gp0, (1, 1), shape, nx, ny)
    fee, feo, foe, foo = fplanes

    def upd(p, mask, gs):
        return jnp.where(mask, p + om * (gs - p), p)

    def sweep(pl4):
        ee, eo, oe, oo = pl4
        ee = upd(ee, m_ee,
                 (fee + (w * jnp.roll(oe, 1, 0) + e * oe
                         + s * jnp.roll(eo, 1, 1) + n * eo)) * inv_c)
        oo = upd(oo, m_oo,
                 (foo + (w * eo + e * jnp.roll(eo, -1, 0)
                         + s * oe + n * jnp.roll(oe, -1, 1))) * inv_c)
        oe = upd(oe, m_oe,
                 (foe + (w * ee + e * jnp.roll(ee, -1, 0)
                         + s * jnp.roll(oo, 1, 1) + n * oo)) * inv_c)
        eo = upd(eo, m_eo,
                 (feo + (w * jnp.roll(oo, 1, 0) + e * oo
                         + s * ee + n * jnp.roll(ee, -1, 1))) * inv_c)
        return ee, eo, oe, oo

    return jax.lax.fori_loop(0, sweeps, lambda _, p: sweep(p),
                             tuple(planes))


def _whole_kernel(u_ref, f_ref, p_ref, o_ref, *, nx, ny, sweeps, omega):
    stp = tuple(p_ref[0, k] for k in range(5))
    planes = tuple(u_ref[a].astype(jnp.float32) for a in range(4))
    fplanes = tuple(f_ref[a].astype(jnp.float32) for a in range(4))
    out = _plane_sweeps(planes, fplanes, _np.int32(0), nx, ny, stp,
                        jnp.asarray(omega, jnp.float32), sweeps)
    for a in range(4):
        o_ref[a] = out[a].astype(o_ref.dtype)


def _strips_kernel(u_hbm, f_hbm, p_ref, o_hbm, wu, wf, ow, twu, twf,
                   in_sems, out_sems, tail_sems,
                   *, hx, hy, nx, ny, sweeps, omega, strip, halo,
                   n_loop, t0, wst, wt):
    om = jnp.asarray(omega, jnp.float32)
    win = strip + 2 * halo

    def win_start(k):
        off = jnp.maximum(jnp.asarray(k * strip - halo, jnp.int32),
                          _np.int32(0))
        return pl.multiple_of(off, 8)

    def in_dma(slot, k):
        slot = jnp.asarray(slot, jnp.int32)
        st_row = win_start(k)
        copies = []
        for a in range(4):
            ai = _np.int32(a)
            copies.append(pltpu.make_async_copy(
                u_hbm.at[ai, pl.ds(st_row, win), :], wu.at[slot, ai],
                in_sems.at[slot, ai]))
            copies.append(pltpu.make_async_copy(
                f_hbm.at[ai, pl.ds(st_row, win), :], wf.at[slot, ai],
                in_sems.at[slot, _np.int32(4 + a)]))
        return copies

    def stp():
        return tuple(p_ref[0, k] for k in range(5))

    if n_loop > 0:
        for d in in_dma(0, 0):
            d.start()

    def body(k):
        slot = k & 1
        nxt = (k + 1) & 1

        @pl.when(k + 1 < n_loop)
        def _():
            for d in in_dma(nxt, k + 1):
                d.start()

        for d in in_dma(slot, k):
            d.wait()

        planes = tuple(wu[slot, _np.int32(a)].astype(jnp.float32)
                       for a in range(4))
        fplanes = tuple(wf[slot, _np.int32(a)].astype(jnp.float32)
                        for a in range(4))
        out = _plane_sweeps(planes, fplanes, win_start(k), nx, ny, stp(),
                            om, sweeps)

        @pl.when(k >= 2)
        def _():
            for a in range(4):
                ai = _np.int32(a)
                pltpu.make_async_copy(
                    ow.at[slot, ai],
                    o_hbm.at[ai, pl.ds(jnp.asarray((k - 2) * strip,
                                                   jnp.int32), strip), :],
                    out_sems.at[slot, ai]).wait()

        @pl.when(k == 0)
        def _():
            for a in range(4):
                ow[slot, _np.int32(a)] = out[a][0:strip].astype(ow.dtype)

        @pl.when(k > 0)
        def _():
            for a in range(4):
                ow[slot, _np.int32(a)] = (
                    out[a][halo:halo + strip].astype(ow.dtype))

        for a in range(4):
            ai = _np.int32(a)
            pltpu.make_async_copy(
                ow.at[slot, ai],
                o_hbm.at[ai, pl.ds(pl.multiple_of(k * strip, 8), strip), :],
                out_sems.at[slot, ai]).start()
        return (k + _np.int32(1)).astype(jnp.int32)

    jax.lax.while_loop(lambda k: k < n_loop, body, _np.int32(0))

    # ---- static tail: plane rows [t0, hx) from window [wst, hx) ----
    def tail_dma():
        copies = []
        for a in range(4):
            ai = _np.int32(a)
            copies.append(pltpu.make_async_copy(
                u_hbm.at[ai, pl.ds(_np.int32(wst), wt), :], twu.at[ai],
                tail_sems.at[ai]))
            copies.append(pltpu.make_async_copy(
                f_hbm.at[ai, pl.ds(_np.int32(wst), wt), :], twf.at[ai],
                tail_sems.at[_np.int32(4 + a)]))
        return copies

    for d in tail_dma():
        d.start()
    for d in tail_dma():
        d.wait()
    planes = tuple(twu[_np.int32(a)].astype(jnp.float32) for a in range(4))
    fplanes = tuple(twf[_np.int32(a)].astype(jnp.float32) for a in range(4))
    out = _plane_sweeps(planes, fplanes, _np.int32(wst), nx, ny, stp(),
                        om, sweeps)
    off = t0 - wst
    for a in range(4):
        twu[_np.int32(a)] = out[a].astype(twu.dtype)
    for a in range(4):
        ai = _np.int32(a)
        pltpu.make_async_copy(
            twu.at[ai, pl.ds(_np.int32(off), hx - t0), :],
            o_hbm.at[ai, pl.ds(_np.int32(t0), hx - t0), :],
            tail_sems.at[ai]).start()

    for k in range(max(0, n_loop - 2), n_loop):
        for a in range(4):
            ai = _np.int32(a)
            pltpu.make_async_copy(
                ow.at[_np.int32(k & 1), ai],
                o_hbm.at[ai, pl.ds(_np.int32(k * strip), strip), :],
                out_sems.at[_np.int32(k & 1), ai]).wait()
    for a in range(4):
        ai = _np.int32(a)
        pltpu.make_async_copy(
            twu.at[ai, pl.ds(_np.int32(off), hx - t0), :],
            o_hbm.at[ai, pl.ds(_np.int32(t0), hx - t0), :],
            tail_sems.at[ai]).wait()


def multisweep_planes(
    st: Stencil,
    up,
    fp,
    *,
    nx: int,
    ny: int,
    sweeps: int = 2,
    omega: float = 1.0,
    strip: int = 192,
    interpret: bool = False,
):
    """``sweeps`` RB-GS/SOR sweeps on stacked parity planes (4, hx, hy).

    Constant-coefficient all-Dirichlet path (the flagship configuration);
    ``up``/``fp`` from ops.planes.split_field. Whole-plane-set VMEM
    residency below WHOLE_PLANES_BYTES, strip pipeline above."""
    assert jnp.ndim(st.c) == 0, "plane smoother: constant stencils only"
    _, hx, hy = up.shape
    params = jnp.stack(
        [jnp.asarray(x, jnp.float32) for x in (st.c, st.w, st.e, st.s, st.n)]
    ).reshape(1, 5)
    nbytes = up.size * up.dtype.itemsize
    if nbytes <= WHOLE_PLANES_BYTES:
        kernel = partial(_whole_kernel, nx=nx, ny=ny, sweeps=int(sweeps),
                         omega=float(omega))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(up.shape, up.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 5), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
            interpret=interpret,
        )(up, fp, params)

    # plane-row halo: a full red-then-black sweep has dependency radius 2
    # PLANE rows (black reads fresh red at +-1, which read old values one
    # more row out), so `sweeps` sweeps need 2*sweeps rows per side,
    # rounded up to the 8-row DMA alignment
    halo = -(-2 * int(sweeps) // _HALO_ALIGN) * _HALO_ALIGN
    # Total kernel VMEM = scratch windows + the Mosaic stack for the sweep
    # bodies (~24 live (rows, hy) f32 arrays, calibrated from two measured
    # scoped-OOM reports: 16.44M at hy=640/strip=104 -> 23 live; 16.46M at
    # hy=1152/strip=40 -> 21 live). The tail window wt = hx - wst grows
    # when strip does not divide hx, so estimate each candidate strip with
    # its ACTUAL windows and take the largest that fits a 14.5 MB budget.
    isz = up.dtype.itemsize

    def _est(s):
        wwin = s + 2 * halo
        nl = max(0, hx // s - 1)
        wwt = hx - max(0, nl * s - halo)
        scratch = hy * isz * 4 * (4 * wwin + 2 * s + 2 * wwt)
        stack = 24 * max(wwin, wwt) * hy * 4
        return scratch + stack

    strip = min(strip, hx) // 8 * 8
    while strip > 8 and _est(strip) > 14.5e6:
        strip -= 8
    strip = max(8, strip)
    n_strips = hx // strip
    if n_strips < 2 or strip < halo:
        kernel = partial(_whole_kernel, nx=nx, ny=ny, sweeps=int(sweeps),
                         omega=float(omega))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(up.shape, up.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 5), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
            interpret=interpret,
        )(up, fp, params)
    n_loop = max(0, n_strips - 1)
    t0 = n_loop * strip
    wst = max(0, t0 - halo)
    wt = hx - wst
    win = strip + 2 * halo
    kernel = partial(
        _strips_kernel, hx=hx, hy=hy, nx=nx, ny=ny, sweeps=int(sweeps),
        omega=float(omega), strip=int(strip), halo=int(halo),
        n_loop=int(n_loop), t0=int(t0), wst=int(wst), wt=int(wt),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(up.shape, up.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 5), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 4, win, hy), up.dtype),
            pltpu.VMEM((2, 4, win, hy), fp.dtype),
            pltpu.VMEM((2, 4, strip, hy), up.dtype),
            pltpu.VMEM((4, wt, hy), up.dtype),
            pltpu.VMEM((4, wt, hy), fp.dtype),
            pltpu.SemaphoreType.DMA((2, 8)),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(up, fp, params)
