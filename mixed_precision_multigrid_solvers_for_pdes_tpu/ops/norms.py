"""Grid norms with high-precision accumulation.

Matches reference core/grid.py:174 (scaled L2: sqrt(hx*hy*sum(f^2))) and the
max norm, but always accumulates in float64 (XLA-emulated on TPU) — the
algorithmic replacement for the reference's fp32-state/fp64-accumulate CUDA
residual kernel (reference cuda_kernels.py:843-883). Inputs are padded arrays
whose padding/fixed cells are zero, so whole-array reductions are exact.
"""

from __future__ import annotations

import jax.numpy as jnp


def scaled_l2(r, hx: float, hy: float, *, accum_dtype=jnp.float64):
    r64 = r.astype(accum_dtype)
    return jnp.sqrt(hx * hy * jnp.sum(r64 * r64))


def l2(r, *, accum_dtype=jnp.float64):
    r64 = r.astype(accum_dtype)
    return jnp.sqrt(jnp.sum(r64 * r64))


def max_norm(r):
    return jnp.max(jnp.abs(r))


def masked_scaled_l2(r, mask, hx: float, hy: float, *, accum_dtype=jnp.float64):
    r64 = jnp.where(mask, r, jnp.zeros((), r.dtype)).astype(accum_dtype)
    return jnp.sqrt(hx * hy * jnp.sum(r64 * r64))
