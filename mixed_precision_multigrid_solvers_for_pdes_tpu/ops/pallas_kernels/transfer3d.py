"""Pallas TPU fused 3D transfer kernels: residual+restrict, prolong+correct.

3D siblings of ops/pallas_kernels/transfer.py, in the rolling-plane pipeline
style of smooth3d.py (the reference's transfer kernels are 2D-only CUDA,
reference gpu/cuda_kernels.py:451-541; its 3D solvers are stubs).

- ``residual_restrict3d``: fc = R(f - A u), 27-point full weighting, one
  pass. Fine x-planes stream through VMEM rings; each residual plane is
  tri-weighted in (y, z), decimated (y by sublane reshape, z by the in-VMEM
  transpose trick — lane-dim stride-2 is illegal in Mosaic), and accumulated
  with x-weights (1, 2, 1)/.. into coarse-plane buffers that DMA out as they
  complete. Traffic: read u + f, write the 1/8-size coarse array — ~2.1
  passes vs the XLA chain's ~4.25 + MXU decimation time.
- ``prolong_correct3d``: u + P ec on fine unknowns, trilinear, one pass.
  Coarse planes stream in, are zero-interleaved + [1/2 1 1/2]-convolved in
  (y, z) once each, and combined across x (even plane = interp(ci), odd =
  half*(interp(ci) + interp(ci+1))) while u streams through: ~2.4 passes vs
  the XLA prolong-materialize-add chain's ~3.25 + MXU.

Constant-coefficient all-Dirichlet boxes, default transfer operators,
fp32/bf16, whole (py, pz) planes VMEM-resident (no y-strips yet — gated by
plane size in ops/dispatch.py). Numerics match ops/transfer3d.py up to FP
summation order (the XLA path routes z through MXU matmuls).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stencil3d import Stencil3D

# fine (py, pz) fp32 plane budget for whole-plane residency:
# rr: ~8 ring planes + ~4 temps; pc: ~6 fine planes + temps
PLANE_BUDGET_BYTES = 1_000_000


def _lane_decimate(w):
    """(rows, pz) -> (rows, pz//2) even lanes via transpose + sublane
    split-reshape + transpose (cf. transfer.py:_lane_decimate)."""
    rows, pz = w.shape
    t = w.T
    v = t.reshape(pz // 2, 2, rows)[:, 0]
    return v.T


def _lane_zero_interleave(c, pz_out):
    """(rows, pzc) -> (rows, pz_out): c[k] at lane 2k, zeros at odd lanes."""
    rows, pzc = c.shape
    t = c.T
    z = jnp.stack([t, jnp.zeros_like(t)], axis=1)
    return z.reshape(2 * pzc, rows)[:pz_out].T


def _pad2(a, rows_out, cols_out):
    """Zero-pad/slice a 2-d block to (rows_out, cols_out), static shapes."""
    r, c = a.shape
    if c > cols_out:
        a = a[:, :cols_out]
    elif c < cols_out:
        a = jnp.concatenate(
            [a, jnp.zeros((r, cols_out - c), a.dtype)], axis=1)
    if r > rows_out:
        a = a[:rows_out]
    elif r < rows_out:
        a = jnp.concatenate(
            [a, jnp.zeros((rows_out - r, cols_out), a.dtype)], axis=0)
    return a


# ---------------------------------------------------------------------------
# fused residual + 27-point full-weighting restriction
# ---------------------------------------------------------------------------

def _rr3_kernel(p_ref, u_hbm, f_hbm, o_hbm, uo, ff, co, ob,
                in_sems, out_sems, *, px, py, pz, pxc, pyc, pzc,
                nxf, nyf, nzf, ncx, ncy, ncz, u_cast, f_cast):
    compute = jnp.float32
    c, w, e, s, n, b, t = (p_ref[0, k] for k in range(7))
    py2, pz2 = py // 2, pz // 2

    gj = jax.lax.broadcasted_iota(jnp.int32, (py, pz), 0)
    gk = jax.lax.broadcasted_iota(jnp.int32, (py, pz), 1)
    in_plane = (gj > 0) & (gj < nyf - 1) & (gk > 0) & (gk < nzf - 1)
    cj = jax.lax.broadcasted_iota(jnp.int32, (py2, pz2), 0)
    ck = jax.lax.broadcasted_iota(jnp.int32, (py2, pz2), 1)
    c_in_plane = (cj > 0) & (cj < ncy - 1) & (ck > 0) & (ck < ncz - 1)

    def in_dma(idx):
        slot = idx & 3
        return (
            pltpu.make_async_copy(u_hbm.at[idx], uo.at[slot],
                                  in_sems.at[slot, _np.int32(0)]),
            pltpu.make_async_copy(f_hbm.at[idx], ff.at[slot],
                                  in_sems.at[slot, _np.int32(1)]),
        )

    def out_dma(ci):
        slot = ci & 1
        return pltpu.make_async_copy(ob.at[slot], o_hbm.at[ci],
                                     out_sems.at[slot])

    def load(ring, q, cast):
        v = ring[q & 3]
        return v.astype(compute) if cast else v

    def dplane(q):
        """decim_yz(tri_z(tri_y(residual plane q))) — (py2, pz2), x1."""
        u0 = load(uo, q, u_cast)
        r = load(ff, q, f_cast) - (
            c * u0 - (w * load(uo, q - 1, u_cast) + e * load(uo, q + 1, u_cast)
                      + s * jnp.roll(u0, 1, 0) + n * jnp.roll(u0, -1, 0)
                      + b * jnp.roll(u0, 1, 1) + t * jnp.roll(u0, -1, 1)))
        unknown = ((q > 0) & (q < nxf - 1)) & in_plane
        r = jnp.where(unknown, r, jnp.zeros((), compute))
        row = 2.0 * r + jnp.roll(r, 1, 0) + jnp.roll(r, -1, 0)
        wsum = 2.0 * row + jnp.roll(row, 1, 1) + jnp.roll(row, -1, 1)
        wy = wsum.reshape(py2, 2, pz)[:, 0]          # y (sublane) decimation
        return _lane_decimate(wy)                    # z (lane) decimation

    def finalize(ci):
        """Scale + coarse-interior mask + stage + DMA the completed plane."""
        @pl.when(ci >= 2)
        def _():
            out_dma(ci - 2).wait()

        cunk = ((ci > 0) & (ci < ncx - 1)) & c_in_plane
        val = jnp.where(cunk, co[ci & 3] * (1.0 / 64.0),
                        jnp.zeros((), compute))
        ob[ci & 1] = _pad2(val, pyc, pzc).astype(ob.dtype)
        out_dma(ci).start()

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

        # plane q = i-1: accumulate into coarse planes (x-weights 1,2,1)
        @pl.when((i >= 1) & (i <= px))
        def _():
            q = i - 1
            d = dplane(q)
            even = (q & 1) == 0

            @pl.when(even & (q == 0))
            def _():
                co[_np.int32(0)] = 2.0 * d

            @pl.when(even & (q > 0))
            def _():
                ci = q >> 1  # >> not //: Mosaic signed-div lowering recurses
                co[ci & 3] = co[ci & 3] + 2.0 * d

            @pl.when(~even)
            def _():
                ci_b = (q + 1) >> 1          # first contribution
                co[ci_b & 3] = d
                ci_a = (q - 1) >> 1          # last contribution -> complete
                co[ci_a & 3] = co[ci_a & 3] + d
                finalize(ci_a)

        return (i + _np.int32(1)).astype(jnp.int32)

    jax.lax.while_loop(lambda i: i < px + 2, body, _np.int32(0))

    # drain the last two coarse-plane copies (ci = px//2 - 2, px//2 - 1)
    n_done = px // 2
    if n_done >= 2:
        out_dma(_np.int32(n_done - 2)).wait()
    out_dma(_np.int32(n_done - 1)).wait()

    # zero-fill coarse padding planes [px//2, pxc)
    for ci in range(n_done, pxc):
        slot = ci & 1
        ob[slot] = jnp.zeros((pyc, pzc), ob.dtype)
        out_dma(_np.int32(ci)).start()
        out_dma(_np.int32(ci)).wait()


def residual_restrict3d(
    st: Stencil3D,
    u,
    f,
    *,
    nxf: int, nyf: int, nzf: int,
    ncx: int, ncy: int, ncz: int,
    pshape_coarse,
    out_dtype=None,
    interpret: bool = False,
):
    """fc = 27-point full-weighting restriction of (f - A u), one kernel.

    Matches ``transfer3d.restrict3d(stencil3d.residual(...),
    method='full_weighting', boundary='zero')`` up to FP summation order."""
    if jnp.ndim(st.c) != 0:
        raise ValueError("residual_restrict3d requires a scalar stencil")
    px, py, pz = u.shape
    if px < 4:
        raise ValueError("pipeline needs px >= 4")
    pxc, pyc, pzc = pshape_coarse
    out_dtype = out_dtype or u.dtype
    params = jnp.stack(
        [jnp.asarray(x, jnp.float32)
         for x in (st.c, st.w, st.e, st.s, st.n, st.b, st.t)]
    ).reshape(1, 7)
    kernel = partial(
        _rr3_kernel, px=px, py=py, pz=pz, pxc=pxc, pyc=pyc, pzc=pzc,
        nxf=nxf, nyf=nyf, nzf=nzf, ncx=ncx, ncy=ncy, ncz=ncz,
        u_cast=u.dtype != jnp.float32, f_cast=f.dtype != jnp.float32,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((pxc, pyc, pzc), out_dtype),
        in_specs=[
            pl.BlockSpec((1, 7), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, py, pz), u.dtype),             # u planes
            pltpu.VMEM((4, py, pz), f.dtype),             # f planes
            pltpu.VMEM((4, py // 2, pz // 2), jnp.float32),  # coarse accum
            pltpu.VMEM((2, pyc, pzc), out_dtype),         # out staging
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(params, u, f)


# ---------------------------------------------------------------------------
# fused trilinear prolongation + correction
# ---------------------------------------------------------------------------

def _pc3_kernel(ec_hbm, u_hbm, o_hbm, er, ei, uo, ob, ec_sems, u_sems,
                out_sems, *, px, py, pz, pxc, pyc, pzc,
                nxf, nyf, nzf, u_cast, e_cast):
    compute = jnp.float32
    half = jnp.asarray(0.5, compute)

    gj = jax.lax.broadcasted_iota(jnp.int32, (py, pz), 0)
    gk = jax.lax.broadcasted_iota(jnp.int32, (py, pz), 1)
    in_plane = (gj > 0) & (gj < nyf - 1) & (gk > 0) & (gk < nzf - 1)

    def ec_dma(ci):
        slot = ci & 3
        return pltpu.make_async_copy(ec_hbm.at[ci], er.at[slot],
                                     ec_sems.at[slot])

    def u_dma(i):
        slot = i & 3
        return pltpu.make_async_copy(u_hbm.at[i], uo.at[slot],
                                     u_sems.at[slot])

    def out_dma(i):
        slot = i & 1
        return pltpu.make_async_copy(ob.at[slot], o_hbm.at[i],
                                     out_sems.at[slot])

    def interp_yz(ci):
        """In-plane interp of coarse plane ci -> fine-size (py, pz)."""
        cplane = er[ci & 3]
        if e_cast:
            cplane = cplane.astype(compute)
        zy = jnp.stack([cplane, jnp.zeros_like(cplane)],
                       axis=1).reshape(2 * pyc, pzc)[:py]
        fz = _lane_zero_interleave(zy, pz)
        fz = fz + half * (jnp.roll(fz, 1, 0) + jnp.roll(fz, -1, 0))
        return fz + half * (jnp.roll(fz, 1, 1) + jnp.roll(fz, -1, 1))

    # coarse planes consumed: ci = 0 .. min(px//2, pxc-1); fine planes whose
    # 'hi' coarse neighbor would fall outside are fully masked (>= nxf-1)
    n_ci = min(px // 2, pxc - 1) + 1

    # pipeline: at step i (fine plane), ensure ei[(i//2 + 1) & 3] exists;
    # coarse DMA runs two coarse planes ahead.
    for k in range(min(3, n_ci)):
        ec_dma(_np.int32(k)).start()
    u_dma(_np.int32(0)).start()
    ec_dma(_np.int32(0)).wait()
    ei[_np.int32(0)] = interp_yz(_np.int32(0))

    def body(i):
        @pl.when(i + 1 <= px - 1)
        def _():
            u_dma(i + 1).start()

        # interp the next needed coarse plane: ci = i//2 + 1 at even i
        @pl.when(((i & 1) == 0) & ((i >> 1) + 1 <= n_ci - 1))
        def _():
            ci = (i >> 1) + 1

            @pl.when(ci + 2 <= n_ci - 1)
            def _():
                ec_dma(ci + 2).start()

            ec_dma(ci).wait()
            ei[ci & 3] = interp_yz(ci)

        @pl.when(i <= px - 1)
        def _():
            u_dma(i).wait()

            @pl.when(i >= 2)
            def _():
                out_dma(i - 2).wait()

            u0 = uo[i & 3]
            if u_cast:
                u0 = u0.astype(compute)
            lo = ei[(i >> 1) & 3]
            hi = ei[((i >> 1) + 1) & 3]
            even = (i & 1) == 0
            e_pl = jnp.where(even, lo, half * (lo + hi))
            unknown = ((i > 0) & (i < nxf - 1)) & in_plane
            res = jnp.where(unknown, u0 + e_pl, u0)
            ob[i & 1] = res.astype(ob.dtype)
            out_dma(i).start()

        return (i + _np.int32(1)).astype(jnp.int32)

    jax.lax.while_loop(lambda i: i < px, body, _np.int32(0))
    out_dma(_np.int32(px - 2)).wait()
    out_dma(_np.int32(px - 1)).wait()


def prolong_correct3d(
    ec,
    u,
    *,
    ncx: int, ncy: int, ncz: int,
    nxf: int, nyf: int, nzf: int,
    interpret: bool = False,
):
    """u + P ec on fine unknowns (trilinear P), one kernel.

    Matches ``where(unknown, u + transfer3d.prolong3d(ec, ...), u)`` up to
    FP summation order."""
    pxc, pyc, pzc = ec.shape
    px, py, pz = u.shape
    if px < 4:
        raise ValueError("pipeline needs px >= 4")
    if 2 * pyc < py or 2 * pzc < pz:
        raise ValueError("coarse padding too small for interleave")
    kernel = partial(
        _pc3_kernel, px=px, py=py, pz=pz, pxc=pxc, pyc=pyc, pzc=pzc,
        nxf=nxf, nyf=nyf, nzf=nzf,
        u_cast=u.dtype != jnp.float32, e_cast=ec.dtype != jnp.float32,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, pyc, pzc), ec.dtype),          # raw coarse planes
            pltpu.VMEM((4, py, pz), jnp.float32),         # interp planes
            pltpu.VMEM((4, py, pz), u.dtype),             # u planes
            pltpu.VMEM((2, py, pz), u.dtype),             # out staging
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ec, u)
