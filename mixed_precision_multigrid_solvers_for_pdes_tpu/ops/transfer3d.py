"""3D intergrid transfers: 27-point full-weighting and trilinear prolongation.

3D siblings of ops/transfer.py. Restriction weights are the tensor product
[1 2 1]/4 ^ (x,y,z) (sums to 1); prolongation uses the interleave-reshape
formulation that proved ~6x faster than stride-2 scatters in 2D.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp


def _restrict_interior_parity3(rf, ncx, ncy, ncz, dtype):
    """27-point full weighting via parity-plane decomposition (see the 2D
    version in transfer.py for the why: contiguous unit rolls instead of
    stride-2 gathers, full precision, no conv)."""
    px, py, pz = rf.shape
    v = rf.astype(dtype).reshape(px // 2, 2, py // 2, 2, pz // 2, 2)
    planes = {
        (p0, p1, p2): v[:, p0, :, p1, :, p2]
        for p0 in (0, 1) for p1 in (0, 1) for p2 in (0, 1)
    }
    acc = 8.0 * planes[(0, 0, 0)]
    for par in planes:
        odd_axes = [ax for ax, p in enumerate(par) if p == 1]
        if not odd_axes:
            continue
        w = {1: 4.0, 2: 2.0, 3: 1.0}[len(odd_axes)]
        base = planes[par]
        # sum of the plane shifted by 0/-1 along each odd axis
        for shifts in itertools.product((0, 1), repeat=len(odd_axes)):
            t = base
            for ax, s in zip(odd_axes, shifts):
                if s:
                    t = jnp.roll(t, 1, ax)
            acc = acc + w * t
    c = acc / 64.0
    return c[1 : ncx - 1, 1 : ncy - 1, 1 : ncz - 1]


def _restrict_interior_fine3(rf, dtype):
    """27-point full weighting as a fused separable sum at fine resolution +
    1x1x1 stride-2 conv downsample at Precision.HIGHEST (see the 2D version
    in transfer.py: 2x faster than the parity reshape, exact; the default
    TPU conv precision quantizes to bf16 even for a copy kernel)."""
    rf = rf.astype(dtype)

    def tri(a, ax):
        return 2.0 * a + jnp.roll(a, 1, ax) + jnp.roll(a, -1, ax)

    w = tri(tri(tri(rf, 0), 1), 2) / 64.0
    k = jnp.ones((1, 1, 1, 1, 1), dtype)
    return jax.lax.conv_general_dilated(
        w[None, None], k, (2, 2, 2), "VALID",
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]


def _fine_window3(rf, ncx, ncy, ncz, d0, d1, d2):
    return rf[
        2 + d0 : 2 * (ncx - 2) + d0 + 1 : 2,
        2 + d1 : 2 * (ncy - 2) + d1 + 1 : 2,
        2 + d2 : 2 * (ncz - 2) + d2 + 1 : 2,
    ]


def restrict3d(rf, ncx: int, ncy: int, ncz: int, pshape_coarse, *,
               method: str = "full_weighting", dtype=None):
    """Fine -> coarse; interior coarse nodes only (Dirichlet residuals are
    zero on the boundary ring)."""
    dtype = dtype or rf.dtype
    if method == "injection":
        interior = _fine_window3(rf, ncx, ncy, ncz, 0, 0, 0)
    elif method == "full_weighting":
        # conv path TPU-only (see ops/transfer.py: XLA:CPU f32 conv crash)
        if (jax.default_backend() == "tpu"
                and jnp.dtype(dtype) in (jnp.dtype(jnp.float32),
                                         jnp.dtype(jnp.bfloat16))):
            c = _restrict_interior_fine3(rf, dtype)
            interior = c[1 : ncx - 1, 1 : ncy - 1, 1 : ncz - 1]
        else:
            interior = _restrict_interior_parity3(rf, ncx, ncy, ncz, dtype)
    else:
        raise ValueError(f"unknown restriction {method!r}")
    out = jnp.zeros(pshape_coarse, dtype)
    return out.at[1 : ncx - 1, 1 : ncy - 1, 1 : ncz - 1].set(
        interior.astype(dtype)
    )


def prolong3d(ec, ncx: int, ncy: int, ncz: int, nfx: int, nfy: int, nfz: int,
              pshape_fine, *, dtype=None):
    """Coarse -> fine trilinear interpolation via interleave-reshape."""
    dtype = dtype or ec.dtype
    c = ec[:ncx, :ncy, :ncz].astype(dtype)
    half = jnp.asarray(0.5, dtype)

    def mid(a, axis):
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[axis] = slice(0, -1)
        sl_hi[axis] = slice(1, None)
        return half * (a[tuple(sl_lo)] + a[tuple(sl_hi)])

    def interleave(a_even, a_odd, axis):
        """Merge (n, ...) even samples with (n-1, ...) odd midpoints along
        ``axis`` -> size 2n-1."""
        pad = [(0, 0)] * 3
        pad[axis] = (0, 1)
        a_odd_p = jnp.pad(a_odd, pad)  # pad to n for stacking
        stacked = jnp.stack([a_even, a_odd_p], axis=axis + 1)
        shp = list(a_even.shape)
        shp[axis] = 2 * a_even.shape[axis]
        merged = stacked.reshape(shp)
        sl = [slice(None)] * 3
        sl[axis] = slice(0, 2 * a_even.shape[axis] - 1)
        return merged[tuple(sl)]

    # interpolate axis by axis: z, then y, then x
    u = interleave(c, mid(c, 2), 2)                  # (ncx, ncy, nfz)
    u = interleave(u, mid(u, 1), 1)                  # (ncx, nfy, nfz)
    u = interleave(u, mid(u, 0), 0)                  # (nfx, nfy, nfz)
    out = jnp.zeros(pshape_fine, dtype)
    return out.at[:nfx, :nfy, :nfz].set(u)
