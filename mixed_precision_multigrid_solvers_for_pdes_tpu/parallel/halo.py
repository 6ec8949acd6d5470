"""Explicitly-scheduled halo exchange: shard_map + ppermute smoothing.

TPU-native replacement for the reference's hand-rolled multi-GPU halo
exchange (reference gpu/multi_gpu_solver.py:90-159 exchange_halo_async:
device-to-device copies of edge rows/cols into neighbor halos, 4 directions)
and its scalar all-reduce (:161-185). Here each device's block is extended by
a 1-ring halo fetched with ``jax.lax.ppermute`` over the ('x','y') mesh axes,
smoothing runs locally, and norms reduce with ``psum`` — all inside one
shard_map region that XLA schedules over ICI.

This module is the *explicit* path; the portable default is the GSPMD path in
parallel/distributed.py (sharding constraints, XLA inserts the collectives).
Both produce bit-identical smoother output (tested on the CPU 8-device mesh —
something the reference could not test without 2+ physical GPUs,
reference tests/unit/test_gpu_acceleration.py:476-517).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers.multigrid import Level


def _axis_shift(x, axis_name: str, shift: int, axis_size: int):
    """ppermute x by ``shift`` along the named mesh axis (non-periodic: edge
    devices receive zeros, matching halo_width-1 Dirichlet padding)."""
    if axis_size == 1:
        return jnp.zeros_like(x)
    perm = [(i, i + shift) for i in range(axis_size) if 0 <= i + shift < axis_size]
    return jax.lax.ppermute(x, axis_name, perm)


def _with_halo(blk, mx: int, my: int):
    """Extend a local (bx, by) block to (bx+2, by+2) with neighbor halos.

    Neighbor edge rows/cols arrive via ppermute; mesh-boundary halos are zero
    (they are padding/Dirichlet territory, masked out of every update)."""
    top = _axis_shift(blk[-1:, :], "x", +1, mx)     # from x-1 neighbor
    bot = _axis_shift(blk[:1, :], "x", -1, mx)      # from x+1 neighbor
    ext = jnp.concatenate([top, blk, bot], axis=0)  # (bx+2, by)
    left = _axis_shift(ext[:, -1:], "y", +1, my)
    right = _axis_shift(ext[:, :1], "y", -1, my)
    return jnp.concatenate([left, ext, right], axis=1)


def _global_masks(lev: Level, bx: int, by: int):
    """unknown + red masks for the local block, from global indices."""
    ix = jax.lax.axis_index("x") * bx
    iy = jax.lax.axis_index("y") * by
    gi = ix + jax.lax.broadcasted_iota(jnp.int32, (bx, by), 0)
    gj = iy + jax.lax.broadcasted_iota(jnp.int32, (bx, by), 1)
    nx, ny = lev.grid.nx, lev.grid.ny
    from ..core.bc import BCKind

    spec = lev.spec
    unknown = (gi < nx) & (gj < ny)
    if spec.west.kind == BCKind.DIRICHLET:
        unknown &= gi > 0
    if spec.east.kind == BCKind.DIRICHLET:
        unknown &= gi < nx - 1
    if spec.south.kind == BCKind.DIRICHLET:
        unknown &= gj > 0
    if spec.north.kind == BCKind.DIRICHLET:
        unknown &= gj < ny - 1
    red = ((gi + gj) & 1) == 0
    return unknown, red


def shard_smooth(
    mesh: Mesh,
    lev: Level,
    u,
    f,
    *,
    method: str = "rbgs",
    sweeps: int = 2,
    omega: float = 1.0,
):
    """Run ``sweeps`` smoothing sweeps with explicit halo exchange.

    ``u``/``f`` are global padded arrays (sharded or not — shard_map splits
    them). Jacobi exchanges halos once per sweep; RB-GS once per color (true
    Gauss-Seidel ordering across device boundaries, which the reference's
    halo scheme only refreshed once per sweep pair,
    reference multi_gpu_solver.py:486-518)."""
    mx = mesh.shape["x"]
    my = mesh.shape["y"]
    px, py = lev.grid.shape_padded
    if px % mx or py % my:
        raise ValueError(f"padded shape {(px, py)} not divisible by mesh "
                         f"{(mx, my)}")
    if lev.spec.any_periodic:
        # Periodic specs keep a scalar stencil, but _with_halo zero-fills
        # mesh-edge halos (no wrap ppermute) and _global_masks has no PERIODIC
        # branch — silently wrong answers. Periodic runs take the GSPMD path
        # (parallel/distributed.py) or the full-solve path in halo_solve.py.
        raise NotImplementedError(
            "shard_smooth: periodic BCs are not supported on the explicit "
            "halo path; use the GSPMD path")
    bx, by = px // mx, py // my
    st = lev.stencil
    if jnp.ndim(st.c) != 0:
        raise NotImplementedError("explicit halo path: constant stencil only "
                                  "(variable coefficients take the GSPMD path)")
    om = jnp.asarray(omega, u.dtype)

    def nbsum_halo(uh):
        # uh: (bx+2, by+2); returns neighbor sum on the (bx, by) core
        return (
            st.w * uh[:-2, 1:-1]
            + st.e * uh[2:, 1:-1]
            + st.s * uh[1:-1, :-2]
            + st.n * uh[1:-1, 2:]
        )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("x", "y"), P("x", "y")),
        out_specs=P("x", "y"),
    )
    def run(u_blk, f_blk):
        unknown, red = _global_masks(lev, bx, by)

        if method == "jacobi":

            def sweep(_, ub):
                uh = _with_halo(ub, mx, my)
                r = f_blk - (st.c * ub - nbsum_halo(uh))
                return jnp.where(unknown, ub + om * r / st.c, ub)

        else:  # rbgs / sor

            def color(ub, mask):
                uh = _with_halo(ub, mx, my)
                u_gs = (f_blk + nbsum_halo(uh)) / st.c
                return jnp.where(mask & unknown, ub + om * (u_gs - ub), ub)

            def sweep(_, ub):
                ub = color(ub, red)
                return color(ub, ~red)

        return jax.lax.fori_loop(0, sweeps, sweep, u_blk)

    return run(u, f)


def global_residual_norm(mesh: Mesh, lev: Level, u, f):
    """Scaled L2 of the residual via per-device partial sums + psum
    (replaces the reference's host-side reduction,
    reference multi_gpu_solver.py:546-572)."""
    mx = mesh.shape["x"]
    my = mesh.shape["y"]
    px, py = lev.grid.shape_padded
    bx, by = px // mx, py // my
    if lev.spec.any_periodic:
        raise NotImplementedError(
            "global_residual_norm: periodic BCs are not supported on the "
            "explicit halo path; use the GSPMD path")
    st = lev.stencil
    hx, hy = lev.grid.hx, lev.grid.hy

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("x", "y"), P("x", "y")),
        out_specs=P(),
    )
    def run(u_blk, f_blk):
        unknown, _ = _global_masks(lev, bx, by)
        uh = _with_halo(u_blk, mx, my)
        Au = st.c * u_blk - (
            st.w * uh[:-2, 1:-1] + st.e * uh[2:, 1:-1]
            + st.s * uh[1:-1, :-2] + st.n * uh[1:-1, 2:]
        )
        r = jnp.where(unknown, f_blk - Au, jnp.zeros((), u_blk.dtype))
        local = jnp.sum(r.astype(jnp.float64) ** 2)
        total = jax.lax.psum(jax.lax.psum(local, "x"), "y")
        return jnp.sqrt(hx * hy * total)

    return run(u, f)
