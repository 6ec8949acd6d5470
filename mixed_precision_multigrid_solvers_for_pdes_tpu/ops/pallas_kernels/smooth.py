"""Pallas TPU multi-sweep smoothing kernels.

TPU-native replacement for the reference's CUDA smoothing kernels
(reference gpu/cuda_kernels.py:87-275 jacobi/RBGS/SOR and the shared-memory
blocked variants :214-275, :982-1048). Two kernels:

- ``multisweep`` (whole level VMEM-resident): all ``sweeps`` sweeps run in one
  kernel — one HBM round-trip total. Marginal cost measured on v5e at 513^2
  fp32: 2.75 us per RB-GS sweep vs 9.2 us for the XLA path (which pays ~6
  HBM passes per sweep and is already at the BW roofline — the kernel wins
  by eliminating traffic, not by out-computing XLA). This is the VMEM
  analogue of the reference's multi-iteration shared-memory block GS kernel
  (cuda_kernels.py:982-1048), without its stale-halo approximation.
- ``multisweep_strips`` (tiled + double-buffered): for levels too big for
  whole-grid VMEM residency (>= 769^2 fp32). Sublane-dim strips with an
  8-row-aligned halo (>= 2*sweeps rows) are DMA'd HBM->VMEM with two buffers
  so the next strip's fetch overlaps the current strip's compute; each strip
  runs all sweeps in VMEM (halo rows recomputed redundantly, 12.5% at
  strip=128/halo=8); the exact interior is written back through
  double-buffered async copies, with a statically-offset tail window
  covering rows the strip grid misses. Strips span the full lane width, so
  no lane-dim halos exist. Measured marginal per RB-GS sweep fp32 (v5e,
  vs the XLA path): 17.1 vs 31.1 us at 1025^2, 70.9 vs 160.2 us at 2049^2
  — and bit-exact against the XLA smoother at fp32.

Red-black GS runs both colors per sweep in-register; masks come from iota,
costing no memory traffic. bf16 arrays are computed in fp32 in-kernel and
stored back as bf16 (replaces the CUDA fp16 tensor-core tier).

Both kernels also take VARIABLE-COEFFICIENT stencils (2-d coefficient
arrays, e.g. jump/variable diffusion via harmonic faces): the five
coefficient planes stream through VMEM windows alongside u and f. The
multisweep amortization is even larger there — the XLA path re-reads all
five coefficient arrays every color update (~12 HBM passes per RB-GS sweep)
while the kernel reads them once per strip: (7 in + 1 out)/k passes for k
sweeps. Dirichlet rectangles only; Neumann/Robin/periodic and masked
irregular domains take the XLA path via ops/dispatch.py.

NOTE (round-2 correction, scripts/kernel_microbench.py): round 1 concluded
these kernels lose to XLA; that measurement was contaminated by the ~27 ms
fixed per-execution cost of the axon tunnel. The two-K marginal protocol
shows the opposite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stencil import Stencil

# Whole-grid residency budget: u, f, out + fori working copies must fit in
# ~16 MB VMEM. Measured on v5e: 2.02 MB (656x768 fp32) compiles, 2.78 MB
# (776x896) does not; larger levels take the strip kernel.
WHOLE_GRID_BYTES = 2_100_000
# variable-coefficient: five extra resident coefficient planes -> lower cap
WHOLE_GRID_BYTES_VAR = 1_100_000


# ---------------------------------------------------------------------------
# parity-plane (checkerboard-split) sweep body
# ---------------------------------------------------------------------------
#
# RB-GS in the direct layout pays twice: every color update computes the
# full-width Gauss-Seidel value at ALL points and discards half through the
# color mask, and every neighbor sum moves full-width rolls. Splitting the
# window into its four parity planes P[a][b](i,j) = u(2i+a, 2j+b) makes the
# red points exactly {ee, oo} and the black points {eo, oe}: each color
# update touches only its own half of the data with half-width rolls — ~2x
# less VPU work per sweep (measured: 1.35 vs 2.75 us/sweep at 513^2 fp32,
# scripts/kernel_microbench.py pallas_parity vs pallas_roll). The split and
# merge run in VMEM via the transpose trick (lane-dim stride-2 is illegal
# in Mosaic; transposes are not — same device-proven pattern as
# transfer._lane_decimate) and amortize over the in-kernel sweeps.
# Replaces the reference's color-masked CUDA RB-GS at the layout level
# (reference gpu/cuda_kernels.py:147-211 evaluates the color mask per
# thread and idles half the warp per color).


def _lane_split(x):
    """(h, py) -> even-lane/odd-lane halves (h, py//2) via transpose +
    sublane split-reshape + transpose (all Mosaic-legal)."""
    h, py = x.shape
    t = x.T
    v = t.reshape(py // 2, 2, h)
    return v[:, 0].T, v[:, 1].T


def _lane_merge(a, b):
    """Inverse of _lane_split: interleave two (h, hy) halves -> (h, 2*hy)."""
    h, hy = a.shape
    t = jnp.stack([a.T, b.T], axis=1)      # (hy, 2, h)
    return t.reshape(2 * hy, h).T


def _split_parity(x):
    """(rows, py) -> parity planes (ee, eo, oe, oo), each (rows//2, py//2);
    plane (a, b) holds x[2i+a, 2j+b]. rows and py must be even (all padded
    window shapes are)."""
    rows, py = x.shape
    v = x.reshape(rows // 2, 2, py)        # sublane split (legal)
    ee, eo = _lane_split(v[:, 0])
    oe, oo = _lane_split(v[:, 1])
    return ee, eo, oe, oo


def _merge_parity(ee, eo, oe, oo):
    rows2, _ = ee.shape
    E = _lane_merge(ee, eo)
    O = _lane_merge(oe, oo)
    return jnp.stack([E, O], axis=1).reshape(2 * rows2, E.shape[1])


def _parity_sweeps(u, f, gi0, nx, ny, stp, omega, method, sweeps):
    """``sweeps`` RB-GS/SOR sweeps on the parity planes of window ``u``.

    ``gi0`` is the global fine row of window row 0 (even; python int or
    traced int32 — window starts are 8-aligned so global parity lines up
    with plane identity). Bit-exact vs the direct-layout body: identical
    per-point arithmetic and operand order, so fp32 results match the XLA
    smoother exactly."""
    c, w, e, s, n = stp
    inv_c = 1.0 / c
    om = omega
    rows, py = u.shape
    hx, hy = rows // 2, py // 2
    ii = jax.lax.broadcasted_iota(jnp.int32, (hx, hy), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (hx, hy), 1)

    def unk(a, b):
        gi = gi0 + 2 * ii + a
        gj = 2 * jj + b
        return (gi > 0) & (gi < nx - 1) & (gj > 0) & (gj < ny - 1)

    m_ee, m_eo, m_oe, m_oo = unk(0, 0), unk(0, 1), unk(1, 0), unk(1, 1)
    fee, feo, foe, foo = _split_parity(f)

    def upd(p, mask, gs):
        return jnp.where(mask, p + om * (gs - p), p)

    def sweep(planes):
        ee, eo, oe, oo = planes
        # red = {ee, oo} (global (i+j) even), then black reads fresh red
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

    planes = jax.lax.fori_loop(0, sweeps, lambda _, p: sweep(p),
                               _split_parity(u))
    return _merge_parity(*planes)


def _sweep_body(f, unknown, red, c, w, e, s, n, omega, method):
    """One smoothing sweep u -> u on a VMEM-resident array (+halo context).

    Shared by both kernels; all operands are jnp values (fp32)."""
    inv_c = 1.0 / c

    def nbsum(u):
        return (
            w * jnp.roll(u, 1, 0)
            + e * jnp.roll(u, -1, 0)
            + s * jnp.roll(u, 1, 1)
            + n * jnp.roll(u, -1, 1)
        )

    if method == "jacobi":

        def sweep(u):
            r = f - (c * u - nbsum(u))
            return jnp.where(unknown, u + omega * r * inv_c, u)

    else:  # rbgs / sor: red then black, GS ordering within the sweep

        def color_update(u, mask):
            u_gs = (f + nbsum(u)) * inv_c
            return jnp.where(mask & unknown, u + omega * (u_gs - u), u)

        def sweep(u):
            u = color_update(u, red)
            return color_update(u, ~red)

    return sweep


# ---------------------------------------------------------------------------
# whole-grid kernel
# ---------------------------------------------------------------------------

def _smooth_kernel(u_ref, f_ref, p_ref, o_ref, *, nx, ny, sweeps, omega,
                   method, parity=False):
    compute_dtype = jnp.float32
    c, w, e, s, n = (p_ref[0, k] for k in range(5))
    om = jnp.asarray(omega, compute_dtype)

    if parity and method != "jacobi":
        u = _parity_sweeps(
            u_ref[:].astype(compute_dtype), f_ref[:].astype(compute_dtype),
            0, nx, ny, (c, w, e, s, n), om, method, sweeps)
        o_ref[:] = u.astype(o_ref.dtype)
        return

    px, py = u_ref.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (px, py), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (px, py), 1)
    unknown = (i > 0) & (i < nx - 1) & (j > 0) & (j < ny - 1)
    red = ((i + j) & 1) == 0  # & not %: Mosaic mod-lowering recurses

    f = f_ref[:].astype(compute_dtype)
    sweep = _sweep_body(f, unknown, red, c, w, e, s, n, om, method)
    u = jax.lax.fori_loop(0, sweeps, lambda _, u: sweep(u),
                          u_ref[:].astype(compute_dtype))
    o_ref[:] = u.astype(o_ref.dtype)


def _smooth_kernel_var(u_ref, f_ref, c_ref, w_ref, e_ref, s_ref, n_ref,
                       o_ref, *, nx, ny, sweeps, omega, method):
    """Whole-grid multisweep with 2-d coefficient planes VMEM-resident."""
    compute_dtype = jnp.float32
    om = jnp.asarray(omega, compute_dtype)

    px, py = u_ref.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (px, py), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (px, py), 1)
    unknown = (i > 0) & (i < nx - 1) & (j > 0) & (j < ny - 1)
    red = ((i + j) & 1) == 0

    f = f_ref[:].astype(compute_dtype)
    # padding/boundary rows hold c == 0 in some constructions; guard the
    # reciprocal (those nodes are masked, the value is never used)
    c = c_ref[:].astype(compute_dtype)
    c = jnp.where(unknown, c, jnp.ones((), compute_dtype))
    coefs = (c, w_ref[:].astype(compute_dtype),
             e_ref[:].astype(compute_dtype), s_ref[:].astype(compute_dtype),
             n_ref[:].astype(compute_dtype))
    sweep = _sweep_body(f, unknown, red, *coefs, om, method)
    u = jax.lax.fori_loop(0, sweeps, lambda _, u: sweep(u),
                          u_ref[:].astype(compute_dtype))
    o_ref[:] = u.astype(o_ref.dtype)


# Parity-plane layout for RB-GS-family sweeps inside the kernels (see
# _parity_sweeps). MEASURED RESULT (v5e, round 4): the production variant
# LOSES — gate stays off. The round-2 prototype measured 1.35 vs 2.75
# us/sweep at 513^2 on PRE-SPLIT planes with K sweeps amortizing the split;
# in production each 2-sweep call pays the in-VMEM split/merge (u, f in;
# u out — ~18 transpose-trick passes), and the guarded two-K data
# (readback-synced protocol, scripts/_marginal.py) shows:
#   strips/sweep @1025^2: direct 17.3 us vs parity 35.5 (sweeps=2)
#   strips/sweep @2049^2: direct 71.6 us vs parity 188.7
#   full V(2,2) cycle @1025^2: direct 204 us vs parity 267 (same session;
#   absolute numbers that session ran ~3x round-3's — the RELATIVE loss is
#   the datum). Even the in-kernel marginal sweep (4-sweep minus 2-sweep)
#   measured ~17 vs ~11.8 us — the half-width planes do not out-run the
#   direct body under Mosaic at these shapes (576-lane planes occupy 4.5
#   vregs; 4-plane loop carries add copies).
# The unclaimed remainder of the prototype win would need HBM-RESIDENT
# plane storage (split once per solve, parity-native transfer kernels) —
# recorded as future work in docs/DESIGN.md. layout='parity' stays
# available (bit-exact, hardware-validated: reports/hw_validate.json
# parity_smooth_* rel-err 0.0) for A/B and future re-evaluation.
PARITY_DEFAULT = False


def _resolve_parity(layout: str, method: str, varcoef: bool) -> bool:
    if varcoef or method == "jacobi":
        return False  # direct body only (coefficient planes stay unsplit)
    if layout == "parity":
        return True
    if layout == "direct":
        return False
    return PARITY_DEFAULT


def multisweep(
    st: Stencil,
    u,
    f,
    *,
    nx: int,
    ny: int,
    method: str = "rbgs",
    sweeps: int = 2,
    omega: float = 1.0,
    layout: str = "auto",
    interpret: bool = False,
):
    """Run ``sweeps`` smoothing sweeps with the whole grid VMEM-resident.

    ``layout`` selects the in-kernel data layout for RB-GS-family methods:
    'parity' (checkerboard-split planes, ~2x less VPU work per sweep),
    'direct' (full-width color-masked updates), or 'auto' (PARITY_DEFAULT).

    ``interpret=True`` runs the kernel in the Pallas interpreter (any
    backend) — used by CPU tests to pin the kernel's numerics against the
    XLA smoother."""
    if jnp.ndim(st.c) != 0:
        coefs = tuple(jnp.broadcast_to(jnp.asarray(x), u.shape)
                      for x in (st.c, st.w, st.e, st.s, st.n))
        kernel = partial(
            _smooth_kernel_var, nx=nx, ny=ny, sweeps=int(sweeps),
            omega=float(omega), method=method,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
            interpret=interpret,
        )(u, f, *coefs)
    params = jnp.stack(
        [jnp.asarray(x, jnp.float32) for x in (st.c, st.w, st.e, st.s, st.n)]
    ).reshape(1, 5)
    kernel = partial(
        _smooth_kernel, nx=nx, ny=ny, sweeps=int(sweeps),
        omega=float(omega), method=method,
        parity=_resolve_parity(layout, method, varcoef=False),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(u, f, params)


# ---------------------------------------------------------------------------
# strip-tiled double-buffered kernel
# ---------------------------------------------------------------------------

def _strips_kernel(*refs, px, py, nx, ny, sweeps, omega, method, strip, halo,
                   n_loop, t0, wst, wt, n_in, parity=False):
    """Double-buffered fori over the first ``n_loop`` sublane strips, then a
    statically-coded tail window for the last strip + row remainder.

    Generic over ``n_in`` input streams: (u, f) with SMEM stencil scalars on
    the constant-coefficient path, (u, f, c, w, e, s, n) with streamed
    coefficient windows on the variable-coefficient path.

    Mosaic requires every dynamic DMA row offset to be provably divisible by
    the sublane tiling (8): ``strip`` and ``halo`` are multiples of 8 and
    offsets carry ``pl.multiple_of`` hints. The tail (rows [t0, px), window
    [wst, px)) uses python-int offsets, so arbitrary tile-padded row counts
    (e.g. 1032 = 8*129) need no divisibility from ``strip``."""
    compute_dtype = jnp.float32
    if n_in == 2:
        p_ref, refs = refs[0], refs[1:]
    hbm_in = refs[:n_in]
    o_hbm = refs[n_in]
    ws = refs[n_in + 1: 2 * n_in + 1]          # (2, win, py) window buffers
    ow = refs[2 * n_in + 1]
    tws = refs[2 * n_in + 2: 3 * n_in + 2]     # (wt, py) tail windows
    in_sems, out_sems, tail_sems = refs[3 * n_in + 2:]
    om = jnp.asarray(omega, compute_dtype)
    win = strip + 2 * halo

    def win_start(k):
        # k == 0 -> 0; else k*strip - halo. Both multiples of 8. All index
        # math int32: x64 mode would make python-int-derived scalars i64,
        # which tpu.memref_slice rejects.
        off = jnp.maximum(jnp.asarray(k * strip - halo, jnp.int32),
                          _np.int32(0))
        return pl.multiple_of(off, 8)

    def in_dma(slot, k):
        slot = jnp.asarray(slot, jnp.int32)
        st_row = win_start(k)
        return tuple(
            pltpu.make_async_copy(h.at[pl.ds(st_row, win), :], wb.at[slot],
                                  in_sems.at[slot, _np.int32(m)])
            for m, (h, wb) in enumerate(zip(hbm_in, ws))
        )

    def make_masks(gi_start, shape):
        gi = gi_start + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        gj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        unknown = (gi > 0) & (gi < nx - 1) & (gj > 0) & (gj < ny - 1)
        red = ((gi + gj) & 1) == 0
        return unknown, red

    def window_coefs(vals, unknown):
        if n_in == 2:
            return tuple(p_ref[0, k] for k in range(5))
        c = jnp.where(unknown, vals[2], jnp.ones((), compute_dtype))
        return (c,) + tuple(vals[3:7])

    def run_sweeps(vals, gi0, shape):
        """All in-window sweeps; parity-plane body on the scalar-stencil
        path (window starts are 8-aligned, so ``gi0`` is even and global
        parity lines up with plane identity)."""
        if parity and n_in == 2:
            stp = tuple(p_ref[0, k] for k in range(5))
            return _parity_sweeps(vals[0], vals[1], gi0, nx, ny, stp, om,
                                  method, sweeps)
        unknown, red = make_masks(gi0, shape)
        c, w, e, s, n = window_coefs(vals, unknown)
        sweep = _sweep_body(vals[1], unknown, red, c, w, e, s, n, om, method)
        return jax.lax.fori_loop(0, sweeps, lambda _, u: sweep(u), vals[0])

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

        vals = [wb[slot].astype(compute_dtype) for wb in ws]
        u = run_sweeps(vals, win_start(k), (win, py))

        # exact interior of this strip: global rows [k*strip, k*strip+strip);
        # window offset is 0 for the first strip, halo otherwise (Mosaic
        # can't dynamic_slice a value, so branch over the two static slices).
        # The same slot's previous write-back (strip k-2) must land before
        # its buffer is overwritten.
        @pl.when(k >= 2)
        def _():
            pltpu.make_async_copy(ow.at[slot], o_hbm.at[pl.ds(jnp.asarray((k - 2) * strip, jnp.int32),
                                                              strip), :],
                                  out_sems.at[slot]).wait()

        @pl.when(k == 0)
        def _():
            ow[slot] = u[0:strip].astype(ow.dtype)

        @pl.when(k > 0)
        def _():
            ow[slot] = u[halo:halo + strip].astype(ow.dtype)

        pltpu.make_async_copy(
            ow.at[slot],
            o_hbm.at[pl.ds(pl.multiple_of(k * strip, 8), strip), :],
            out_sems.at[slot]).start()
        return (k + _np.int32(1)).astype(jnp.int32)

    # Explicit while_loop with an int32 counter: under x64 (this package
    # enables it) fori_loop's induction var is int64, and the resulting
    # in-kernel i64->i32 scalar converts (feeding the int32 iota masks) send
    # Mosaic's convert-lowering into infinite recursion.
    jax.lax.while_loop(
        lambda k: k < n_loop,
        lambda k: body(k),
        _np.int32(0),
    )

    # ---- static tail: rows [t0, px) computed from window [wst, px) ----
    def tail_dma():
        return tuple(
            pltpu.make_async_copy(h.at[pl.ds(_np.int32(wst), wt), :], tw,
                                  tail_sems.at[_np.int32(m)])
            for m, (h, tw) in enumerate(zip(hbm_in, tws))
        )

    for d in tail_dma():
        d.start()
    for d in tail_dma():
        d.wait()
    vals = [tw[:].astype(compute_dtype) for tw in tws]
    u = run_sweeps(vals, wst, (wt, py))
    tw_u = tws[0]
    off = t0 - wst
    tw_u[:] = u.astype(tw_u.dtype)
    pltpu.make_async_copy(tw_u.at[pl.ds(_np.int32(off), px - t0), :],
                          o_hbm.at[pl.ds(_np.int32(t0), px - t0), :],
                          tail_sems.at[_np.int32(0)]).start()

    # drain the loop's last (up to) two in-flight output copies + the tail
    for k in range(max(0, n_loop - 2), n_loop):
        pltpu.make_async_copy(ow.at[_np.int32(k & 1)],
                              o_hbm.at[pl.ds(_np.int32(k * strip), strip), :],
                              out_sems.at[_np.int32(k & 1)]).wait()
    pltpu.make_async_copy(tw_u.at[pl.ds(_np.int32(off), px - t0), :],
                          o_hbm.at[pl.ds(_np.int32(t0), px - t0), :],
                          tail_sems.at[_np.int32(0)]).wait()


def multisweep_strips(
    st: Stencil,
    u,
    f,
    *,
    nx: int,
    ny: int,
    method: str = "rbgs",
    sweeps: int = 2,
    omega: float = 1.0,
    strip: int = 192,
    layout: str = "auto",
    interpret: bool = False,
):
    """Strip-tiled multisweep for levels beyond whole-grid VMEM residency.

    ``strip`` is a target row-block size; it is snapped to a multiple of 8
    (Mosaic's sublane tiling). Rows the strip grid doesn't cover are handled
    by a statically-offset tail window, so any tile-padded row count works.
    Default 192 from the round-5 strip sweep (scripts/strip_tune.py,
    guarded two-K at 1025^2/2049^2): 128/192 tie at 1025^2 (34.0 vs 33.9
    us per 2-sweep call) but 192 wins 16%% at 2049^2 (132.6 vs 158.6 us);
    taller strips amortize the halo re-read until the VMEM cap bites.

    Variable-coefficient stencils (2-d leaves) stream the five coefficient
    planes through their own double-buffered windows (n_in = 7)."""
    varcoef = jnp.ndim(st.c) != 0
    n_in = 7 if varcoef else 2
    px, py = u.shape
    halo = (1 if method == "jacobi" else 2) * int(sweeps)
    halo = -(-halo // 8) * 8          # Mosaic: DMA row offsets multiple of 8
    # scratch = 2*n_in windows + 2 out strips + n_in tail windows
    # ~= (3*n_in + 4)*strip rows; cap so scratch stays ~<=7 MB of the 16 MB
    # VMEM (the rest is compute temporaries: masks + ~6 live sweep copies of
    # one window)
    cap = int(7e6 / ((3 * n_in + 4) * py * u.dtype.itemsize)) - halo
    strip = max(8, (min(strip, cap, px) // 8) * 8)
    n_strips = px // strip
    if n_strips < 2 or strip < halo:
        # fits in (or nearly in) one window -> whole-grid kernel instead
        return multisweep(st, u, f, nx=nx, ny=ny, method=method,
                          sweeps=sweeps, omega=omega, layout=layout,
                          interpret=interpret)
    # loop strips: k in [0, n_loop); tail covers [t0, px)
    n_loop = n_strips - 1
    t0 = n_loop * strip
    wst = t0 - halo                    # multiple of 8
    wt = px - wst
    win = strip + 2 * halo
    kernel = partial(
        _strips_kernel, px=px, py=py, nx=nx, ny=ny, sweeps=int(sweeps),
        omega=float(omega), method=method, strip=int(strip), halo=halo,
        n_loop=n_loop, t0=t0, wst=wst, wt=wt, n_in=n_in,
        parity=_resolve_parity(layout, method, varcoef=varcoef),
    )
    if varcoef:
        coefs = tuple(jnp.broadcast_to(jnp.asarray(x), u.shape)
                      for x in (st.c, st.w, st.e, st.s, st.n))
        inputs = (u, f) + coefs
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_in
    else:
        params = jnp.stack(
            [jnp.asarray(x, jnp.float32)
             for x in (st.c, st.w, st.e, st.s, st.n)]
        ).reshape(1, 5)
        inputs = (params, u, f)
        in_specs = [
            pl.BlockSpec((1, 5), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
    stream_dtypes = [u.dtype, f.dtype] + [
        jnp.asarray(x).dtype for x in
        ((st.c, st.w, st.e, st.s, st.n) if varcoef else ())
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=(
            [pltpu.VMEM((2, win, py), dt) for dt in stream_dtypes]   # windows
            + [pltpu.VMEM((2, strip, py), u.dtype)]                  # out
            + [pltpu.VMEM((wt, py), dt) for dt in stream_dtypes]     # tails
            + [
                pltpu.SemaphoreType.DMA((2, n_in)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((n_in,)),
            ]
        ),
        interpret=interpret,
    )(*inputs)
