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
  whole-grid VMEM residency (>= 1025^2 fp32). Sublane-dim strips with a
  2*sweeps-row halo are DMA'd HBM->VMEM with two buffers so the next strip's
  fetch overlaps the current strip's compute; each strip runs all sweeps in
  VMEM (halo rows recomputed redundantly, ~6% at strip=128/sweeps=2); the
  exact interior is written back through double-buffered async copies.
  Strips span the full lane width, so no lane-dim halos exist.

Red-black GS runs both colors per sweep in-register; masks come from iota,
costing no memory traffic. bf16 arrays are computed in fp32 in-kernel and
stored back as bf16 (replaces the CUDA fp16 tensor-core tier).

Constant-coefficient Dirichlet fast path only — exactly the hot configuration
(fine Poisson/Helmholtz levels); everything else takes the XLA path via
ops/dispatch.py.

NOTE (round-2 correction, scripts/kernel_microbench.py): round 1 concluded
these kernels lose to XLA; that measurement was contaminated by the ~27 ms
fixed per-execution cost of the axon tunnel. The two-K marginal protocol
shows the opposite.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stencil import Stencil

# Whole-grid residency budget: u, f, out + fori working copies must fit in
# ~16 MB VMEM. 3 MB arrays (640^2 fp32-ish) leave headroom measured to
# compile and win; 1025^2 (4.8 MB) takes the strip kernel.
WHOLE_GRID_BYTES = 3 * 1024 * 1024


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
                   method):
    compute_dtype = jnp.float32
    c, w, e, s, n = (p_ref[0, k] for k in range(5))
    om = jnp.asarray(omega, compute_dtype)

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
    interpret: bool = False,
):
    """Run ``sweeps`` smoothing sweeps with the whole grid VMEM-resident.

    ``interpret=True`` runs the kernel in the Pallas interpreter (any
    backend) — used by CPU tests to pin the kernel's numerics against the
    XLA smoother."""
    if jnp.ndim(st.c) != 0:
        raise ValueError("pallas multisweep requires a scalar (constant) stencil")
    params = jnp.stack(
        [jnp.asarray(x, jnp.float32) for x in (st.c, st.w, st.e, st.s, st.n)]
    ).reshape(1, 5)
    kernel = partial(
        _smooth_kernel, nx=nx, ny=ny, sweeps=int(sweeps),
        omega=float(omega), method=method,
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

def _strips_kernel(p_ref, u_hbm, f_hbm, o_hbm, uw, fw, ow, in_sems, out_sems,
                   *, px, py, nx, ny, sweeps, omega, method, strip, halo):
    """fori over sublane strips; window (strip+2*halo, py) per buffer slot.

    Window starts are clamped to [0, px - win], so edge strips shift their
    interior offset instead of shrinking (static DMA sizes)."""
    compute_dtype = jnp.float32
    c, w, e, s, n = (p_ref[0, k] for k in range(5))
    om = jnp.asarray(omega, compute_dtype)
    win = strip + 2 * halo
    n_strips = pl.cdiv(px, strip)

    def win_start(k):
        return jnp.clip(k * strip - halo, 0, px - win)

    def in_dma(slot, k):
        st_row = win_start(k)
        return (
            pltpu.make_async_copy(u_hbm.at[pl.ds(st_row, win), :],
                                  uw.at[slot], in_sems.at[slot, 0]),
            pltpu.make_async_copy(f_hbm.at[pl.ds(st_row, win), :],
                                  fw.at[slot], in_sems.at[slot, 1]),
        )

    for d in in_dma(0, 0):
        d.start()

    def body(k, _):
        slot = k & 1
        nxt = (k + 1) & 1

        @pl.when(k + 1 < n_strips)
        def _():
            for d in in_dma(nxt, k + 1):
                d.start()

        for d in in_dma(slot, k):
            d.wait()

        st_row = win_start(k)
        gi = st_row + jax.lax.broadcasted_iota(jnp.int32, (win, py), 0)
        gj = jax.lax.broadcasted_iota(jnp.int32, (win, py), 1)
        unknown = (gi > 0) & (gi < nx - 1) & (gj > 0) & (gj < ny - 1)
        red = ((gi + gj) & 1) == 0

        fval = fw[slot].astype(compute_dtype)
        sweep = _sweep_body(fval, unknown, red, c, w, e, s, n, om, method)
        u = jax.lax.fori_loop(0, sweeps, lambda _, u: sweep(u),
                              uw[slot].astype(compute_dtype))

        # exact interior of this strip: global rows [k*strip, k*strip+strip);
        # the same slot's previous write-back (strip k-2) must land before
        # its buffer is overwritten
        off = k * strip - st_row            # in [0, 2*halo]

        @pl.when(k >= 2)
        def _():
            pltpu.make_async_copy(ow.at[slot], o_hbm.at[pl.ds((k - 2) * strip,
                                                              strip), :],
                                  out_sems.at[slot]).wait()

        ow[slot] = jax.lax.dynamic_slice_in_dim(u, off, strip, 0).astype(
            ow.dtype)
        pltpu.make_async_copy(ow.at[slot],
                              o_hbm.at[pl.ds(k * strip, strip), :],
                              out_sems.at[slot]).start()
        return 0

    jax.lax.fori_loop(0, n_strips, body, 0)
    # drain the last (up to) two in-flight output copies; n_strips is static
    for k in range(max(0, n_strips - 2), n_strips):
        pltpu.make_async_copy(ow.at[k & 1],
                              o_hbm.at[pl.ds(k * strip, strip), :],
                              out_sems.at[k & 1]).wait()


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
    strip: int = 128,
    interpret: bool = False,
):
    """Strip-tiled multisweep for levels beyond whole-grid VMEM residency.

    Requires px % strip == 0 (true for tile-padded shapes with strip a
    multiple of 8 dividing px; the wrapper picks a valid strip)."""
    if jnp.ndim(st.c) != 0:
        raise ValueError("pallas multisweep requires a scalar (constant) stencil")
    px, py = u.shape
    while px % strip:
        strip //= 2
    halo = (1 if method == "jacobi" else 2) * int(sweeps)
    win = strip + 2 * halo
    if win > px:
        # degenerate: fits in one window -> whole-grid kernel instead
        return multisweep(st, u, f, nx=nx, ny=ny, method=method,
                          sweeps=sweeps, omega=omega, interpret=interpret)
    params = jnp.stack(
        [jnp.asarray(x, jnp.float32) for x in (st.c, st.w, st.e, st.s, st.n)]
    ).reshape(1, 5)
    kernel = partial(
        _strips_kernel, px=px, py=py, nx=nx, ny=ny, sweeps=int(sweeps),
        omega=float(omega), method=method, strip=int(strip), halo=halo,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[
            pl.BlockSpec((1, 5), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, win, py), u.dtype),      # u windows
            pltpu.VMEM((2, win, py), f.dtype),      # f windows
            pltpu.VMEM((2, strip, py), u.dtype),    # out buffers
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(params, u, f)
