"""3D intergrid transfers: 27-point full-weighting and trilinear prolongation.

3D siblings of ops/transfer.py. Restriction weights are the tensor product
[1 2 1]/4 ^ (x,y,z) (sums to 1); prolongation uses the interleave-reshape
formulation that proved ~6x faster than stride-2 scatters in 2D.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .transfer import _conv_ok

_k1 = np.array([1.0, 2.0, 1.0])
_FW3 = np.einsum("i,j,k->ijk", _k1, _k1, _k1) / 64.0


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
        if _conv_ok(dtype):
            # stride-2 VALID conv (see transfer._restrict_interior_conv for
            # why: stride-2 slicing gathers are pathological on TPU)
            x = rf[None, None, 1 : 2 * (ncx - 1), 1 : 2 * (ncy - 1),
                   1 : 2 * (ncz - 1)].astype(dtype)
            k = jnp.asarray(_FW3, dtype).reshape(1, 1, 3, 3, 3)
            interior = jax.lax.conv_general_dilated(x, k, (2, 2, 2), "VALID")[0, 0]
        else:
            interior = None
            for d0 in (-1, 0, 1):
                for d1 in (-1, 0, 1):
                    for d2 in (-1, 0, 1):
                        wgt = ((2 - abs(d0)) * (2 - abs(d1)) * (2 - abs(d2))) / 64.0
                        term = wgt * _fine_window3(rf, ncx, ncy, ncz, d0, d1, d2)
                        interior = term if interior is None else interior + term
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
