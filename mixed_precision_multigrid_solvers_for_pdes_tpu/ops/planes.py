"""HBM-resident parity-plane field layout (the DESIGN.md follow-up to the
measured in-kernel parity loss).

The level-0 state lives as four parity planes P[a][b](i, j) = u(2i+a, 2j+b),
stacked in one (4, hx, hy) array ordered (ee, eo, oe, oo), split ONCE per
solve. Every level-0 operation then works in plane space:

- RB-GS smoothing touches each color's own half-width planes with
  half-width rolls (no color-masked waste, no per-call split/merge — the
  in-kernel split variant measured a LOSER in round 4 precisely because it
  paid the split per 2-sweep call; see ops/pallas_kernels/smooth.py).
- Full-weighting restriction needs NO decimation at all: the coarse grid IS
  the ee-plane lattice, so the 9-point window sum becomes same-width rolls
  of the four residual planes (the classic TPU lane-decimation trap —
  ops/transfer.py's MXU matmul workaround — disappears structurally).
- Bilinear prolongation+correction is same-width rolls of the coarse
  correction added into each plane.

Split/merge cross the lane-stride-2 boundary exactly twice per solve (via
the MXU selection-matmul pattern, Precision.HIGHEST — exact for 0/1
matrices), amortized over all cycles.

This module holds the XLA-level plane algebra (split/merge, plane masks,
plane residual, plane transfers, plane norms); the strip-pipelined Pallas
plane smoother is ops/pallas_kernels/smooth_planes.py; the level-0
plane-resident solver driver is solvers/plane_solve.py.

Scope (the flagship configuration): constant-coefficient all-Dirichlet
rectangles, full-weighting/bilinear transfers. Everything else uses the
standard layout paths.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from . import stencil as st_mod

PLANE_ORDER = ((0, 0), (0, 1), (1, 0), (1, 1))  # ee, eo, oe, oo

# TPU (sublane, lane) tile. Plane arrays carry their OWN tile padding:
# half a tile-padded fine width is generally NOT 128-lane aligned (e.g.
# 1152/2 = 576 = 4.5 tiles), and Mosaic rejects memref slices of
# misaligned lane extents inside the strip-DMA plane kernel. Padded rows/
# cols hold zeros and are masked off by plane_masks (gi/gj fall outside
# the logical grid).
_SUBLANE, _LANE = 8, 128


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@lru_cache(maxsize=64)
def _lane_select_np(py: int, hy: int, offset: int):
    """(py, hy) 0/1 matrix S with S[2j + offset, j] = 1 for the logical
    half-width py // 2; columns j >= py // 2 (lane-tile padding) are
    all-zero."""
    S = np.zeros((py, hy), np.float32)
    j = np.arange(py // 2)
    S[j * 2 + offset, j] = 1.0
    return S


def _lane_sel(py: int, hy: int, offset: int, dtype):
    return jnp.asarray(_lane_select_np(py, hy, offset), dtype)


def plane_shape(pshape):
    px, py = pshape
    return _round_up(px // 2, _SUBLANE), _round_up(py // 2, _LANE)


def _lane_halves(x):
    """Even/odd lanes of (h, py) via transpose + sublane split + transpose
    (the lane-stride-2 moves to the cheap sublane dim; exact for any
    dtype — used for f64, where a selection matmul would hit the TPU's
    emulated-f64 MXU)."""
    h, py = x.shape
    t = x.T.reshape(py // 2, 2, h)
    return t[:, 0].T, t[:, 1].T


def split_field(u):
    """(px, py) padded field -> (4, hx, hy) parity planes (ee, eo, oe, oo).

    Rows split by a (legal, cheap) sublane reshape; lanes by MXU selection
    matmuls at HIGHEST precision for fp32/bf16 (exact — the matrices are
    0/1) or the transpose trick for f64 — never by a lane-strided slice
    (catastrophic relayout on TPU, CLAUDE.md rule)."""
    px, py = u.shape
    hx0 = px // 2
    hx, hy = plane_shape((px, py))
    rows = u.reshape(hx0, 2, py)
    even_rows, odd_rows = rows[:, 0], rows[:, 1]
    if u.dtype == jnp.float64:
        ee, eo = _lane_halves(even_rows)
        oe, oo = _lane_halves(odd_rows)
        pad = ((0, 0), (0, hy - py // 2))
        ee, eo, oe, oo = (jnp.pad(x, pad) for x in (ee, eo, oe, oo))
    else:
        Se = _lane_sel(py, hy, 0, u.dtype)
        So = _lane_sel(py, hy, 1, u.dtype)
        hi = jax.lax.Precision.HIGHEST
        ee = jnp.dot(even_rows, Se, precision=hi)
        eo = jnp.dot(even_rows, So, precision=hi)
        oe = jnp.dot(odd_rows, Se, precision=hi)
        oo = jnp.dot(odd_rows, So, precision=hi)
    out = jnp.stack([ee, eo, oe, oo])
    if hx > hx0:
        out = jnp.pad(out, ((0, 0), (0, hx - hx0), (0, 0)))
    return out


def _lane_interleave(a, b):
    """Inverse of _lane_halves: (h, hy) + (h, hy) -> (h, 2*hy)."""
    h, hy = a.shape
    t = jnp.stack([a.T, b.T], axis=1)  # (hy, 2, h)
    return t.reshape(2 * hy, h).T


def merge_field(planes, pshape):
    """(4, hx, hy) planes -> (px, py) padded field (inverse of split)."""
    px, py = pshape
    hx0 = px // 2
    planes = planes[:, :hx0]
    ee, eo, oe, oo = planes[0], planes[1], planes[2], planes[3]
    hx, hy = ee.shape
    if planes.dtype == jnp.float64:
        ee, eo, oe, oo = (x[:, : py // 2] for x in (ee, eo, oe, oo))
        even_rows = _lane_interleave(ee, eo)
        odd_rows = _lane_interleave(oe, oo)
    else:
        Se = _lane_sel(py, hy, 0, ee.dtype).T
        So = _lane_sel(py, hy, 1, ee.dtype).T
        hi = jax.lax.Precision.HIGHEST
        even_rows = (jnp.dot(ee, Se, precision=hi)
                     + jnp.dot(eo, So, precision=hi))
        odd_rows = (jnp.dot(oe, Se, precision=hi)
                    + jnp.dot(oo, So, precision=hi))
    return jnp.stack([even_rows, odd_rows], axis=1).reshape(px, py)


def plane_masks(grid: Grid):
    """(4, hx, hy) bool: the all-Dirichlet unknown mask per plane."""
    hx, hy = plane_shape(grid.shape_padded)
    ii = jax.lax.broadcasted_iota(jnp.int32, (hx, hy), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (hx, hy), 1)
    out = []
    for a, b in PLANE_ORDER:
        gi = 2 * ii + a
        gj = 2 * jj + b
        out.append((gi > 0) & (gi < grid.nx - 1)
                   & (gj > 0) & (gj < grid.ny - 1))
    return jnp.stack(out)


def plane_residual(stp, up, fp, masks):
    """r = f - A u in plane space (5-point constant stencil; masked).

    Neighbor identities (fine (i±1, j) etc. in plane coordinates) match the
    ops/pallas_kernels/smooth._parity_sweeps bodies, so arithmetic order is
    identical to the in-kernel parity path."""
    c, w, e, s, n = stp
    ee, eo, oe, oo = up[0], up[1], up[2], up[3]
    r_ee = fp[0] - (c * ee - (w * jnp.roll(oe, 1, 0) + e * oe
                              + s * jnp.roll(eo, 1, 1) + n * eo))
    r_eo = fp[1] - (c * eo - (w * jnp.roll(oo, 1, 0) + e * oo
                              + s * ee + n * jnp.roll(ee, -1, 1)))
    r_oe = fp[2] - (c * oe - (w * ee + e * jnp.roll(ee, -1, 0)
                              + s * jnp.roll(oo, 1, 1) + n * oo))
    r_oo = fp[3] - (c * oo - (w * eo + e * jnp.roll(eo, -1, 0)
                              + s * oe + n * jnp.roll(oe, -1, 1)))
    r = jnp.stack([r_ee, r_eo, r_oe, r_oo])
    return jnp.where(masks, r, jnp.zeros((), r.dtype))


def restrict_planes(rp, ncx: int, ncy: int, pshape_coarse, dtype=None):
    """Full-weighting restriction of residual planes -> standard coarse
    padded array. Coarse (I, J) sits on the ee lattice, so the 9-point
    [1 2 1]^2/16 window is same-width rolls of the four planes — no
    decimation anywhere:

      16*fc = 4*ee + 2*(oe + oe[I-1]) + 2*(eo + eo[J-1])
              + (oo + oo[I-1] + oo[J-1] + oo[I-1,J-1])
    """
    dtype = dtype or rp.dtype
    ee, eo, oe, oo = (x.astype(dtype) for x in (rp[0], rp[1], rp[2], rp[3]))
    acc = 4.0 * ee
    acc = acc + 2.0 * (oe + jnp.roll(oe, 1, 0))
    acc = acc + 2.0 * (eo + jnp.roll(eo, 1, 1))
    oo_w = oo + jnp.roll(oo, 1, 0)
    acc = acc + oo_w + jnp.roll(oo_w, 1, 1)
    acc = acc / 16.0
    hx, hy = acc.shape
    pxc, pyc = pshape_coarse
    out = jnp.zeros(pshape_coarse, dtype)
    out = out.at[: min(hx, pxc), : min(hy, pyc)].set(
        acc[: min(hx, pxc), : min(hy, pyc)])
    ci = jax.lax.broadcasted_iota(jnp.int32, pshape_coarse, 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, pshape_coarse, 1)
    interior = (ci > 0) & (ci < ncx - 1) & (cj > 0) & (cj < ncy - 1)
    return jnp.where(interior, out, jnp.zeros((), dtype))


def prolong_correct_planes(ec, up, masks):
    """u += bilinear-prolongation(ec) in plane space (masked).

      ee += ec ; oe += (ec + ec[I+1])/2 ; eo += (ec + ec[J+1])/2 ;
      oo += (ec + ec[I+1] + ec[J+1] + ec[I+1,J+1])/4
    """
    hx, hy = up.shape[1], up.shape[2]
    E = ec[:hx, :hy].astype(up.dtype)
    Ex = jnp.roll(E, -1, 0)
    Ey = jnp.roll(E, -1, 1)
    Exy = jnp.roll(Ex, -1, 1)
    half = jnp.asarray(0.5, up.dtype)
    quarter = jnp.asarray(0.25, up.dtype)
    add = jnp.stack([
        E,
        half * (E + Ey),
        half * (E + Ex),
        quarter * (E + Ex + Ey + Exy),
    ])
    return jnp.where(masks, up + add, up)


def plane_norm_scaled_l2(rp, hx_grid: float, hy_grid: float):
    """sqrt(hx*hy * sum r^2) over all planes, f64 accumulation
    (= ops.norms.scaled_l2 of the merged field: planes partition the
    nodes)."""
    acc = jnp.sum(rp.astype(jnp.float64) ** 2)
    return jnp.sqrt(hx_grid * hy_grid * acc)
