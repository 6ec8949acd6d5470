"""Microbenchmark: smoothing-kernel formulations on the real TPU.

Probes WHY the round-1 VMEM-resident Pallas multisweep kernel lost to XLA
(VERDICT.md weak #2) by timing isolated variants:

- xla_rbgs / xla_jacobi : the shipped XLA path (per-sweep HBM round trips)
- pallas_roll           : round-1 kernel (jnp.roll both axes, whole grid VMEM)
- pallas_sub / pallas_lane / pallas_none : roll-direction cost isolation
- pallas_parity         : RB-GS on pre-split parity planes (half-width rolls,
                          2 lane-roll-equivalents per sweep instead of 4)
- pallas_copy           : in/out copy floor (kernel overhead + VMEM BW)

Protocol (memory: axon tunnel): K=64 sweeps inside ONE jitted computation,
fresh random inputs per repeat (the relay caches identical executions),
single readback, dispatch overhead measured separately and subtracted.

Usage: python scripts/kernel_microbench.py [--sizes 513,1025] [--k 64]
"""

from __future__ import annotations

import argparse
import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import smooth as smooth_mod
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.stencil import make_stencil


from _marginal import _timed_median, robust_marginal  # noqa: E402


def timed_marginal(make_fn, make_args, k_lo, k_hi, *, repeats=5):
    """Per-iteration cost via the guarded two-K protocol
    (scripts/_marginal.py): median-of-repeats with FORCED READBACK sync
    (block_until_ready can return before remote execution completes on the
    axon tunnel), MAD noise floor, auto-widened K spread. Returns
    (per_iter_or_None, t_lo-est) — None when the delta never cleared the
    noise floor."""
    m = robust_marginal(make_fn, make_args, k_lo=k_lo,
                        dk=max(1, k_hi - k_lo), repeats=repeats)
    return (m.per_iter if m.ok else None), m.noise_floor


def dispatch_overhead():
    f = jax.jit(lambda x: x * 1.0 + 1.0)
    small = lambda: (jnp.asarray(np.random.rand(8, 128), jnp.float32),)
    t, _ = _timed_median(f, small, repeats=5)
    return t


# ---------------------------------------------------------------------------
# probe kernels
# ---------------------------------------------------------------------------

def _probe_kernel(u_ref, f_ref, o_ref, *, nx, ny, sweeps, mode):
    c = jnp.float32(4.0)
    inv_c = jnp.float32(0.25)
    px, py = u_ref.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (px, py), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (px, py), 1)
    unknown = (i > 0) & (i < nx - 1) & (j > 0) & (j < ny - 1)
    red = ((i + j) & 1) == 0
    f = f_ref[:]

    def nbsum(u):
        if mode == "roll":
            return (jnp.roll(u, 1, 0) + jnp.roll(u, -1, 0)
                    + jnp.roll(u, 1, 1) + jnp.roll(u, -1, 1))
        if mode == "sub":  # sublane-only probe (wrong numerics, perf only)
            return (jnp.roll(u, 1, 0) + jnp.roll(u, -1, 0)
                    + jnp.roll(u, 2, 0) + jnp.roll(u, -2, 0))
        if mode == "lane":  # lane-only probe
            return (jnp.roll(u, 1, 1) + jnp.roll(u, -1, 1)
                    + jnp.roll(u, 2, 1) + jnp.roll(u, -2, 1))
        if mode == "none":  # no data movement at all
            return 4.0 * u
        if mode == "concat":  # lane shifts via concatenate, sublane via roll
            w = jnp.concatenate([u[-1:, :], u[:-1, :]], 0)
            e = jnp.concatenate([u[1:, :], u[:1, :]], 0)
            s = jnp.concatenate([u[:, -1:], u[:, :-1]], 1)
            n = jnp.concatenate([u[:, 1:], u[:, :1]], 1)
            return w + e + s + n
        raise ValueError(mode)

    def color_update(u, mask):
        u_gs = (f + nbsum(u)) * inv_c
        return jnp.where(mask & unknown, u_gs, u)

    def sweep(_, u):
        u = color_update(u, red)
        return color_update(u, ~red)

    o_ref[:] = jax.lax.fori_loop(0, sweeps, sweep, u_ref[:])


def probe_call(mode, pshape, nx, ny, sweeps):
    kern = partial(_probe_kernel, nx=nx, ny=ny, sweeps=sweeps, mode=mode)

    @jax.jit
    def run(u, f):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(pshape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(u, f)

    return run


def copy_call(pshape):
    def kern(u_ref, o_ref):
        o_ref[:] = u_ref[:] * 2.0

    @jax.jit
    def run(u):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(pshape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(u)

    return run


# ---------------------------------------------------------------------------
# parity-plane RB-GS kernel (numerically correct; the candidate fast path)
# ---------------------------------------------------------------------------

def _parity_kernel(ee_u, eo_u, oe_u, oo_u, ee_f, eo_f, oe_f, oo_f,
                   ee_o, eo_o, oe_o, oo_o, *, nx, ny, sweeps):
    """RB-GS on parity planes P[a][b](i,j) = fine(2i+a, 2j+b).

    red = {ee, oo}, black = {eo, oe}. Per sweep: 4 half-width lane rolls
    (vs 4 full-width in the direct layout) + 4 half-width sublane rolls.
    """
    c = jnp.float32(4.0)
    inv_c = jnp.float32(0.25)
    hx, hy = ee_u.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (hx, hy), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (hx, hy), 1)

    def unk(a, b):
        gi = 2 * ii + a
        gj = 2 * jj + b
        return (gi > 0) & (gi < nx - 1) & (gj > 0) & (gj < ny - 1)

    unk_ee, unk_eo, unk_oe, unk_oo = unk(0, 0), unk(0, 1), unk(1, 0), unk(1, 1)

    fee, feo, foe, foo = ee_f[:], eo_f[:], oe_f[:], oo_f[:]

    def sweep(_, planes):
        ee, eo, oe, oo = planes
        # red
        ee_new = (fee + jnp.roll(oe, 1, 0) + oe
                  + jnp.roll(eo, 1, 1) + eo) * inv_c
        ee = jnp.where(unk_ee, ee_new, ee)
        oo_new = (foo + eo + jnp.roll(eo, -1, 0)
                  + oe + jnp.roll(oe, -1, 1)) * inv_c
        oo = jnp.where(unk_oo, oo_new, oo)
        # black (reads fresh red)
        oe_new = (foe + ee + jnp.roll(ee, -1, 0)
                  + jnp.roll(oo, 1, 1) + oo) * inv_c
        oe = jnp.where(unk_oe, oe_new, oe)
        eo_new = (feo + jnp.roll(oo, 1, 0) + oo
                  + ee + jnp.roll(ee, -1, 1)) * inv_c
        eo = jnp.where(unk_eo, eo_new, eo)
        return (ee, eo, oe, oo)

    ee, eo, oe, oo = jax.lax.fori_loop(
        0, sweeps, sweep, (ee_u[:], eo_u[:], oe_u[:], oo_u[:]))
    ee_o[:] = ee
    eo_o[:] = eo
    oe_o[:] = oe
    oo_o[:] = oo


def parity_call(pshape, nx, ny, sweeps):
    px, py = pshape
    hshape = (px // 2, py // 2)
    kern = partial(_parity_kernel, nx=nx, ny=ny, sweeps=sweeps)

    @jax.jit
    def run(u, f):
        vu = u.reshape(px // 2, 2, py // 2, 2)
        vf = f.reshape(px // 2, 2, py // 2, 2)
        planes = [vu[:, a, :, b] for a in (0, 1) for b in (0, 1)]
        fplanes = [vf[:, a, :, b] for a in (0, 1) for b in (0, 1)]
        outs = pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct(hshape, jnp.float32)] * 4,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        )(*planes, *fplanes)
        ee, eo, oe, oo = outs
        v = jnp.stack([jnp.stack([ee, eo], -1), jnp.stack([oe, oo], -1)], 1)
        # v: (px//2, 2, py//2, 2) with v[:, a, :, b] = plane(a, b)
        return v.reshape(px, py)

    return run


# ---------------------------------------------------------------------------

def strips_call(st, n, total_sweeps):
    """Chained CALLS of the strip kernel at sweeps=2 (halo grows with the
    in-kernel sweep count, so the K-sweeps-in-one-kernel protocol doesn't
    apply; per-call chaining also charges the real launch+DMA cost)."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels \
        import smooth as psmooth

    calls = max(1, total_sweeps // 2)

    @jax.jit
    def run(u, f):
        def body(i, u):
            return psmooth.multisweep_strips(
                st, u, f + 1e-30 * i, nx=n, ny=n, method="rbgs", sweeps=2,
                omega=1.0)
        return jax.lax.fori_loop(0, calls, body, u)

    return run


def prod_call(st, n, total_sweeps, layout):
    """Chained calls of the PRODUCTION smoothing path (whole-grid or strip
    kernel, same selection rule as ops/dispatch.smooth) at sweeps=2 with an
    explicit layout — the parity-vs-direct A/B that charges every real
    cost: launch, DMA, and the in-VMEM parity split/merge per call."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels \
        import smooth as psmooth

    calls = max(1, total_sweeps // 2)
    g = Grid(n, n)
    nbytes = g.shape_padded[0] * g.shape_padded[1] * 4
    fn = (psmooth.multisweep if nbytes <= psmooth.WHOLE_GRID_BYTES
          else psmooth.multisweep_strips)

    @jax.jit
    def run(u, f):
        def body(i, u):
            return fn(st, u, f + 1e-30 * i, nx=n, ny=n, method="rbgs",
                      sweeps=2, omega=1.0, layout=layout)
        return jax.lax.fori_loop(0, calls, body, u)

    return run


def xla_call(st, unknown, method, sweeps):
    @jax.jit
    def run(u, f):
        return smooth_mod.smooth(st, u, f, unknown, method=method,
                                 sweeps=sweeps, omega=1.0)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="513,1025")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--only", default="",
                    help="comma-separated variant-name substrings to run")
    args = ap.parse_args()
    K = args.k
    only = [s for s in args.only.split(",") if s]

    disp = dispatch_overhead()
    print(f"# dispatch overhead: {disp*1e3:.2f} ms", flush=True)
    results = {}

    for n in [int(s) for s in args.sizes.split(",")]:
        g = Grid(n, n)
        pshape = g.shape_padded
        px, py = pshape
        st = make_stencil(g, dtype=jnp.float32)
        i = jax.lax.broadcasted_iota(jnp.int32, pshape, 0)
        j = jax.lax.broadcasted_iota(jnp.int32, pshape, 1)
        unknown = (i > 0) & (i < n - 1) & (j > 0) & (j < n - 1)

        def mk():
            rng = np.random.default_rng()
            u = np.zeros(pshape, np.float32)
            f = np.zeros(pshape, np.float32)
            u[:n, :n] = rng.standard_normal((n, n))
            f[:n, :n] = rng.standard_normal((n, n))
            return jnp.asarray(u), jnp.asarray(f)

        rows = {}
        K_LO, K_HI = K, K + 4096
        for name, make in [
            ("xla_rbgs", lambda k: xla_call(st, unknown, "rbgs", k)),
            ("xla_jacobi", lambda k: xla_call(st, unknown, "jacobi", k)),
            ("pallas_roll", lambda k: probe_call("roll", pshape, n, n, k)),
            ("pallas_concat", lambda k: probe_call("concat", pshape, n, n, k)),
            ("pallas_sub", lambda k: probe_call("sub", pshape, n, n, k)),
            ("pallas_lane", lambda k: probe_call("lane", pshape, n, n, k)),
            ("pallas_none", lambda k: probe_call("none", pshape, n, n, k)),
            ("pallas_parity", lambda k: parity_call(pshape, n, n, k)),
            ("pallas_strips", lambda k: strips_call(st, n, k)),
            ("prod_direct", lambda k: prod_call(st, n, k, "direct")),
            ("prod_parity", lambda k: prod_call(st, n, k, "parity")),
        ]:
            if only and not any(s in name for s in only):
                continue
            try:
                per_sweep, noise = timed_marginal(make, mk, K_LO, K_HI)
                rows[name] = per_sweep
                if per_sweep is None:
                    print(f"{n:5d}  {name:15s}   BELOW NOISE FLOOR "
                          f"({noise*1e6:.1f} us)", flush=True)
                else:
                    print(f"{n:5d}  {name:15s} {per_sweep*1e6:9.2f} us/sweep "
                          f"(noise {noise*1e6:7.1f} us)", flush=True)
            except Exception as e:
                rows[name] = None
                msg = str(e).split(chr(10))[0][:120]
                print(f"{n:5d}  {name:15s} FAILED: {msg}", flush=True)
        results[n] = rows

    print(json.dumps({str(k): {kk: (vv if vv is None else round(vv * 1e6, 1))
                               for kk, vv in v.items()}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
