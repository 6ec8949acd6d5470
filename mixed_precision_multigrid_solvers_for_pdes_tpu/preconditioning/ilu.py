"""ILU(0) preconditioner for the 5-point stencil (host/CPU parity path).

Parity with reference preconditioning/ilu.py:18-383 (ILUPreconditioner).
Classical ILU(0) on the 5-point sparsity is hand-rolled here (the reference
rolled its own ILU(k) too; scipy's spilu wraps SuperLU's ILUTP, which we found
numerically erratic on these systems — rel. one-shot residual jumping from
0.01 to >1 with fill settings). For the 5-point stencil ILU(0) reduces to a
modified-diagonal recurrence

    d[i,j] = c[i,j] - w[i,j]*e[i-1,j]/d[i-1,j] - s[i,j]*n[i,j-1]/d[i,j-1]

with unit-lower / upper triangular solves swept over grid anti-diagonals
(wavefronts) so each sweep step is vectorized. Triangular substitution is
inherently sequential across wavefronts — this is a HOST path for parity and
CPU-side comparisons; on TPU use ``chebyshev`` or
``multigrid_preconditioner`` (same role, hardware-native shape).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..core.grid import Grid
from ..ops.stencil import Stencil


def _expand(x, shape) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    return np.broadcast_to(x, shape).copy() if x.ndim == 0 else x.astype(np.float64)


class ILUPreconditioner:
    """ILU(0) of the masked 5-point stencil matrix, lexicographic order.

    apply() takes/returns padded grid arrays (numpy or jax).
    """

    def __init__(self, grid: Grid, stencil: Stencil, unknown):
        self.grid = grid
        pshape = grid.shape_padded
        un = np.asarray(unknown)
        self._un = un
        # masked coefficients: identity rows off the unknown set
        c = _expand(stencil.c, pshape)
        w = _expand(stencil.w, pshape) * un
        e = _expand(stencil.e, pshape) * un
        s = _expand(stencil.s, pshape) * un
        n = _expand(stencil.n, pshape) * un
        c = np.where(un, c, 1.0)
        # couplings into non-unknown neighbors contribute nothing
        w[1:, :] *= un[:-1, :]
        w[0, :] = 0.0
        e[:-1, :] *= un[1:, :]
        e[-1, :] = 0.0
        s[:, 1:] *= un[:, :-1]
        s[:, 0] = 0.0
        n[:, :-1] *= un[:, 1:]
        n[:, -1] = 0.0
        self._w, self._e, self._s, self._n = w, e, s, n

        # modified diagonal via wavefront recurrence
        px, py = pshape
        d = c.copy()
        for k in range(1, px + py - 1):  # anti-diagonal i + j = k
            i0 = max(0, k - py + 1)
            i1 = min(k, px - 1)
            ii = np.arange(i0, i1 + 1)
            jj = k - ii
            upd = np.zeros(ii.size)
            has_w = ii >= 1
            upd[has_w] += (w[ii[has_w], jj[has_w]]
                           * e[ii[has_w] - 1, jj[has_w]]
                           / d[ii[has_w] - 1, jj[has_w]])
            has_s = jj >= 1
            upd[has_s] += (s[ii[has_s], jj[has_s]]
                           * n[ii[has_s], jj[has_s] - 1]
                           / d[ii[has_s], jj[has_s] - 1])
            d[ii, jj] -= upd
        self._d = d
        self._px, self._py = px, py

    def apply(self, r):
        """z = U^{-1} L^{-1} r (padded array in/out; zero off unknowns)."""
        r_np = np.where(self._un, np.asarray(r, dtype=np.float64), 0.0)
        px, py = self._px, self._py
        w, e, s, n, d = self._w, self._e, self._s, self._n, self._d
        # forward: (unit lower) y = r + (w/d_W) y_W + (s/d_S) y_S
        y = r_np.copy()
        for k in range(1, px + py - 1):
            i0 = max(0, k - py + 1)
            i1 = min(k, px - 1)
            ii = np.arange(i0, i1 + 1)
            jj = k - ii
            acc = np.zeros(ii.size)
            has_w = ii >= 1
            acc[has_w] += (w[ii[has_w], jj[has_w]]
                           / d[ii[has_w] - 1, jj[has_w]]
                           * y[ii[has_w] - 1, jj[has_w]])
            has_s = jj >= 1
            acc[has_s] += (s[ii[has_s], jj[has_s]]
                           / d[ii[has_s], jj[has_s] - 1]
                           * y[ii[has_s], jj[has_s] - 1])
            y[ii, jj] += acc
        # backward: z = (y + e z_E + n z_N) / d
        z = np.zeros_like(y)
        for k in range(px + py - 2, -1, -1):
            i0 = max(0, k - py + 1)
            i1 = min(k, px - 1)
            ii = np.arange(i0, i1 + 1)
            jj = k - ii
            acc = y[ii, jj].copy()
            has_e = ii <= px - 2
            acc[has_e] += (e[ii[has_e], jj[has_e]]
                           * z[ii[has_e] + 1, jj[has_e]])
            has_n = jj <= py - 2
            acc[has_n] += (n[ii[has_n], jj[has_n]]
                           * z[ii[has_n], jj[has_n] + 1])
            z[ii, jj] = acc / d[ii, jj]
        z = np.where(self._un, z, 0.0)
        return z.astype(np.asarray(r).dtype)

    __call__ = apply

    def memory_usage(self) -> Dict[str, Any]:
        """Factor storage accounting (reference ilu.py:362-383): ILU(0) keeps
        the original sparsity — 5 arrays of the padded shape."""
        nnz = int(self._un.sum()) * 5
        return {
            "matrix_nnz": nnz,
            "factor_nnz": nnz,
            "fill_ratio": 1.0,
            "bytes": 5 * self._d.nbytes,
        }
