"""3D intergrid transfers: 27-point full-weighting and trilinear prolongation.

3D siblings of ops/transfer.py, sharing its hard-won TPU rules:
- never materialize a lane-dim decimation/interleave through XLA (stride-2
  conv/slice/reshape all trigger catastrophic relayouts) — route the z (lane)
  axis through chunk-local MXU matmuls at Precision.HIGHEST (exact);
  x/y decimation and interleave are legal outer/sublane reshapes;
- no chained ring scatters (the GSPMD partitioner miscompiled them in 2D):
  one `.at[].set` per produced array + iota-mask `where` merges;
- Neumann 'reflect' restriction installs reflected values into the padding
  (where + rolls), so ring values fall out of the standard interior sum.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp

from .transfer import _decim_matrix

_CHUNK = 256


def _restrict_full_parity3(rf, dtype):
    """27-point full weighting via parity-plane decomposition, returning the
    FULL coarse-indexed array (px//2, py//2, pz//2) — ring rows included
    (valid when reflection values were installed)."""
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
        for shifts in itertools.product((0, 1), repeat=len(odd_axes)):
            t = base
            for ax, s in zip(odd_axes, shifts):
                if s:
                    t = jnp.roll(t, 1, ax)
            acc = acc + w * t
    return acc / 64.0


def _restrict_full_matmul3(rf, dtype):
    """TPU fast path: fused separable tri-sum + x/y reshape decimation +
    chunk-local MXU z decimation (exact at HIGHEST)."""
    rf = rf.astype(dtype)

    def tri(a, ax):
        return 2.0 * a + jnp.roll(a, 1, ax) + jnp.roll(a, -1, ax)

    w = tri(tri(tri(rf, 0), 1), 2) / 64.0
    px, py, pz = w.shape
    w = w.reshape(px // 2, 2, py, pz)[:, 0]            # x decimation
    w = w.reshape(px // 2, py // 2, 2, pz)[:, :, 0]    # y decimation
    # z (lane) decimation via chunk-local matmuls
    if pz % _CHUNK:
        D = jnp.asarray(_decim_matrix(pz, pz // 2), dtype)
        return jnp.dot(w, D, precision=jax.lax.Precision.HIGHEST)
    D = jnp.asarray(_decim_matrix(_CHUNK, _CHUNK // 2), dtype)
    v = w.reshape(px // 2, py // 2, pz // _CHUNK, _CHUNK)
    c = jnp.einsum("xycz,zk->xyck", v, D,
                   precision=jax.lax.Precision.HIGHEST)
    return c.reshape(px // 2, py // 2, pz // 2)


def _injection_full3(rf, dtype):
    px, py, pz = rf.shape
    v = rf.astype(dtype).reshape(px // 2, 2, py // 2, 2, pz // 2, 2)
    return v[:, 0, :, 0, :, 0]


def restrict3d(rf, ncx: int, ncy: int, ncz: int, pshape_coarse, *,
               method: str = "full_weighting", boundary: str = "zero",
               dtype=None, wrap=(False, False, False)):
    """Fine -> coarse. ``boundary``: 'zero' (Dirichlet residual rings) or
    'reflect' (Neumann/Robin fold, cf. ops/transfer.py)."""
    dtype = dtype or rf.dtype
    px, py, pz = rf.shape
    if boundary == "reflect":
        nfs = (2 * (ncx - 1) + 1, 2 * (ncy - 1) + 1, 2 * (ncz - 1) + 1)
        for ax in range(3):
            if wrap[ax]:
                continue
            idx = jax.lax.broadcasted_iota(jnp.int32, rf.shape, ax)
            rf = jnp.where(idx == rf.shape[ax] - 1, jnp.roll(rf, -2, ax), rf)
            rf = jnp.where(idx == nfs[ax], jnp.roll(rf, 2, ax), rf)

    if method == "injection":
        c = _injection_full3(rf, dtype)
    elif method == "full_weighting":
        if (jax.default_backend() == "tpu"
                and jnp.dtype(dtype) in (jnp.dtype(jnp.float32),
                                         jnp.dtype(jnp.bfloat16))):
            c = _restrict_full_matmul3(rf, dtype)
        else:
            c = _restrict_full_parity3(rf, dtype)
    else:
        raise ValueError(f"unknown restriction {method!r}")

    pxc, pyc, pzc = pshape_coarse
    out = jnp.zeros(pshape_coarse, dtype)
    mx = min(c.shape[0], pxc)
    my = min(c.shape[1], pyc)
    mz = min(c.shape[2], pzc)
    cpad = out.at[:mx, :my, :mz].set(c[:mx, :my, :mz].astype(dtype))
    ci = jax.lax.broadcasted_iota(jnp.int32, pshape_coarse, 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, pshape_coarse, 1)
    ck = jax.lax.broadcasted_iota(jnp.int32, pshape_coarse, 2)
    i0 = 0 if wrap[0] else 1
    j0 = 0 if wrap[1] else 1
    k0 = 0 if wrap[2] else 1
    core = ((ci >= i0) & (ci < ncx - 1) & (cj >= j0) & (cj < ncy - 1)
            & (ck >= k0) & (ck < ncz - 1))
    zero = jnp.zeros((), dtype)
    res = jnp.where(core, cpad, zero)
    if boundary == "reflect":
        ring = (ci < ncx) & (cj < ncy) & (ck < ncz) & ~core
        res = jnp.where(ring, cpad, res)
    return res


def _zero_interleave_z(c, dtype):
    """(.., pzc) -> (.., 2*pzc), values at even lanes (transpose-decimation
    as chunk-local MXU matmuls)."""
    *lead, pzc = c.shape
    HC = _CHUNK // 2
    if pzc % HC:
        T = jnp.asarray(_decim_matrix(2 * pzc, pzc).T, dtype)
        return jnp.dot(c, T, precision=jax.lax.Precision.HIGHEST)
    T = jnp.asarray(_decim_matrix(_CHUNK, HC).T, dtype)
    v = c.reshape(*lead, pzc // HC, HC)
    out = jnp.einsum("...cz,zk->...ck", v, T,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(*lead, 2 * pzc)


def _prolong_matmul3(ec, nfx, nfy, nfz, pshape_fine, dtype):
    """Trilinear prolongation = zero-interleave (x, y via reshapes; z via
    MXU) + separable [1/2 1 1/2]^3 roll convolution + nf cutoff."""
    pxc, pyc, pzc = ec.shape
    pxf, pyf, pzf = pshape_fine
    c = ec.astype(dtype)
    zx = jnp.stack([c, jnp.zeros_like(c)], axis=1).reshape(2 * pxc, pyc, pzc)
    zy = jnp.stack([zx, jnp.zeros_like(zx)], axis=2).reshape(
        2 * pxc, 2 * pyc, pzc)
    fz = _zero_interleave_z(zy, dtype)
    half = jnp.asarray(0.5, dtype)
    w = fz
    for ax in range(3):  # separable (I + S+/2 + S-/2) per axis
        w = w + half * (jnp.roll(w, 1, ax) + jnp.roll(w, -1, ax))
    w = w[:pxf, :pyf, :pzf]
    i = jax.lax.broadcasted_iota(jnp.int32, (pxf, pyf, pzf), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (pxf, pyf, pzf), 1)
    k = jax.lax.broadcasted_iota(jnp.int32, (pxf, pyf, pzf), 2)
    return jnp.where((i < nfx) & (j < nfy) & (k < nfz), w,
                     jnp.zeros((), dtype))


def prolong3d(ec, ncx: int, ncy: int, ncz: int, nfx: int, nfy: int, nfz: int,
              pshape_fine, *, dtype=None):
    """Coarse -> fine trilinear interpolation."""
    dtype = dtype or ec.dtype
    if (jax.default_backend() == "tpu"
            and jnp.dtype(dtype) in (jnp.dtype(jnp.float32),
                                     jnp.dtype(jnp.bfloat16))):
        return _prolong_matmul3(ec, nfx, nfy, nfz, pshape_fine, dtype)
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