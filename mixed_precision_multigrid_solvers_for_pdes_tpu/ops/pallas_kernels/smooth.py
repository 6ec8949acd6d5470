"""Pallas TPU multi-sweep smoothing kernels.

TPU-native replacement for the reference's CUDA smoothing kernels
(reference gpu/cuda_kernels.py:87-275 jacobi/RBGS/SOR and the shared-memory
blocked variants :214-275, :982-1048). Design:

- The whole padded level (u, f) is **VMEM-resident** and all ``sweeps``
  smoothing sweeps run inside one kernel — one HBM round-trip total, versus
  one per sweep (XLA) or one per color per sweep plus a device sync (the
  reference, cuda_kernels.py:346). This is the VMEM analogue of the
  reference's multi-iteration shared-memory block GS kernel
  (cuda_kernels.py:982-1048), without its stale-halo approximation.
- Red-black GS runs both colors per sweep in-register; masks come from iota,
  costing no memory traffic.
- bf16 arrays are computed in fp32 in-kernel and stored back as bf16
  (VPU-native mixed precision; replaces the CUDA fp16 tensor-core tier).

Constant-coefficient Dirichlet fast path only — exactly the hot configuration
(fine Poisson/Helmholtz levels); everything else takes the XLA path via
ops/dispatch.py. Applicability is size-gated by the VMEM budget there.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stencil import Stencil


def _smooth_kernel(u_ref, f_ref, p_ref, o_ref, *, nx, ny, sweeps, omega, method):
    compute_dtype = jnp.float32
    c = p_ref[0, 0]
    w = p_ref[0, 1]
    e = p_ref[0, 2]
    s = p_ref[0, 3]
    n = p_ref[0, 4]
    inv_c = 1.0 / c
    om = jnp.asarray(omega, compute_dtype)

    px, py = u_ref.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (px, py), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (px, py), 1)
    unknown = (i > 0) & (i < nx - 1) & (j > 0) & (j < ny - 1)

    f = f_ref[:].astype(compute_dtype)

    def roll(u, shift, axis):
        # jnp.roll lowers cleanly in Mosaic (pltpu.roll hits a
        # tpu.dynamic_rotate verifier bug in jax 0.9.0)
        return jnp.roll(u, shift, axis)

    def nbsum(u):
        return (
            w * roll(u, 1, 0)
            + e * roll(u, -1, 0)
            + s * roll(u, 1, 1)
            + n * roll(u, -1, 1)
        )

    if method == "jacobi":

        def sweep(_, u):
            r = f - (c * u - nbsum(u))
            return jnp.where(unknown, u + om * r * inv_c, u)

    else:  # rbgs / sor: red then black, GS ordering within the sweep
        red = ((i + j) & 1) == 0  # & instead of %: Mosaic mod-lowering recurses

        def color_update(u, mask):
            u_gs = (f + nbsum(u)) * inv_c
            return jnp.where(mask & unknown, u + om * (u_gs - u), u)

        def sweep(_, u):
            u = color_update(u, red)
            return color_update(u, ~red)

    u = jax.lax.fori_loop(0, sweeps, sweep, u_ref[:].astype(compute_dtype))
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
