"""Pallas kernel numerics, pinned against the XLA reference smoothers via the
Pallas interpreter (runs on the CPU test backend; on TPU the same kernel
compiles through Mosaic)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mixed_precision_multigrid_solvers_for_pdes_tpu.core import bc as bc_mod
from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import (
    smooth as smooth_mod,
    stencil as st_mod,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (
    smooth as psmooth,
)


@pytest.fixture(scope="module")
def setup():
    g = Grid(17, 17)
    st = st_mod.make_stencil(g, dtype=jnp.float32)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded, bc_mod.dirichlet())
    rng = np.random.default_rng(11)
    f = np.zeros((17, 17), np.float32)
    f[1:-1, 1:-1] = rng.standard_normal((15, 15)).astype(np.float32)
    f = jnp.asarray(g.pad_field(f))
    u0 = jnp.asarray(
        np.where(np.asarray(unknown),
                 rng.standard_normal(g.shape_padded), 0.0).astype(np.float32))
    return g, st, unknown, f, u0


@pytest.mark.parametrize("method", ["jacobi", "rbgs"])
@pytest.mark.parametrize("sweeps", [1, 3])
def test_multisweep_matches_xla(setup, method, sweeps):
    g, st, unknown, f, u0 = setup
    omega = 0.8 if method == "jacobi" else 1.0
    ref = smooth_mod.smooth(st, u0, f, unknown, method=method,
                            sweeps=sweeps, omega=omega)
    got = psmooth.multisweep(st, u0, f, nx=g.nx, ny=g.ny, method=method,
                             sweeps=sweeps, omega=omega, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_multisweep_preserves_boundary_and_padding(setup):
    g, st, unknown, f, u0 = setup
    got = np.asarray(psmooth.multisweep(st, u0, f, nx=g.nx, ny=g.ny,
                                        method="rbgs", sweeps=2,
                                        interpret=True))
    assert np.all(got[0, :] == 0) and np.all(got[g.nx - 1, : g.ny] == 0)
    assert np.all(got[:, 0] == 0) and np.all(got[: g.nx, g.ny - 1] == 0)


def test_multisweep_rejects_variable_stencil(setup):
    g, st, unknown, f, u0 = setup
    st_arr = st_mod.Stencil(*(jnp.ones(g.shape_padded, jnp.float32)
                              for _ in range(5)))
    with pytest.raises(ValueError):
        psmooth.multisweep(st_arr, u0, f, nx=g.nx, ny=g.ny, interpret=True)


@pytest.mark.parametrize("method", ["jacobi", "rbgs"])
@pytest.mark.parametrize("n,strip", [(65, 16), (65, 8)])
def test_multisweep_strips_matches_xla(method, n, strip):
    """Strip-tiled kernel must agree with the XLA smoother everywhere,
    including strip seams and the clamped first/last windows."""
    g = Grid(n, n)
    st = st_mod.make_stencil(g, dtype=jnp.float32)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded,
                                  bc_mod.dirichlet())
    rng = np.random.default_rng(23)
    f = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32)
                    * np.asarray(unknown))
    u0 = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32)
                     * np.asarray(unknown))
    omega = 0.8 if method == "jacobi" else 1.0
    sweeps = 2
    ref = smooth_mod.smooth(st, u0, f, unknown, method=method,
                            sweeps=sweeps, omega=omega)
    got = psmooth.multisweep_strips(st, u0, f, nx=g.nx, ny=g.ny,
                                    method=method, sweeps=sweeps,
                                    omega=omega, strip=strip, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_multisweep_strips_degenerate_single_window():
    """Tiny grid where one window covers everything -> whole-grid fallback."""
    g = Grid(17, 17)
    st = st_mod.make_stencil(g, dtype=jnp.float32)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded,
                                  bc_mod.dirichlet())
    rng = np.random.default_rng(29)
    f = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32)
                    * np.asarray(unknown))
    u0 = jnp.zeros(g.shape_padded, jnp.float32)
    ref = smooth_mod.smooth(st, u0, f, unknown, method="rbgs", sweeps=3,
                            omega=1.0)
    got = psmooth.multisweep_strips(st, u0, f, nx=g.nx, ny=g.ny,
                                    method="rbgs", sweeps=3, omega=1.0,
                                    strip=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
