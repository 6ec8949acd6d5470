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


def _varcoef_problem(n, seed):
    """Grid + variable-coefficient (smooth + 10:1 jump) stencil + fields."""
    g = Grid(n, n)
    X, Y = np.meshgrid(np.linspace(0, 1, g.shape_padded[0]),
                       np.linspace(0, 1, g.shape_padded[1]), indexing="ij")
    a = 1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(np.pi * Y)
    a = np.where(X > 0.5, 10.0 * a, a).astype(np.float32)
    st = st_mod.make_stencil(g, a=jnp.asarray(a), dtype=jnp.float32)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded,
                                  bc_mod.dirichlet())
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32)
                    * np.asarray(unknown))
    u0 = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32)
                     * np.asarray(unknown))
    return g, st, unknown, f, u0


@pytest.mark.parametrize("method", ["jacobi", "rbgs"])
@pytest.mark.parametrize("sweeps", [1, 3])
def test_multisweep_varcoef_matches_xla(method, sweeps):
    g, st, unknown, f, u0 = _varcoef_problem(17, 31)
    omega = 0.8 if method == "jacobi" else 1.0
    ref = smooth_mod.smooth(st, u0, f, unknown, method=method,
                            sweeps=sweeps, omega=omega)
    got = psmooth.multisweep(st, u0, f, nx=g.nx, ny=g.ny, method=method,
                             sweeps=sweeps, omega=omega, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


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


@pytest.mark.parametrize("method", ["jacobi", "rbgs"])
def test_multisweep_strips_varcoef_matches_xla(method):
    """Streamed-coefficient strip kernel vs the XLA var-coef smoother,
    covering strip seams with a 10:1 coefficient jump across them."""
    g, st, unknown, f, u0 = _varcoef_problem(65, 37)
    omega = 0.8 if method == "jacobi" else 1.0
    ref = smooth_mod.smooth(st, u0, f, unknown, method=method,
                            sweeps=2, omega=omega)
    got = psmooth.multisweep_strips(st, u0, f, nx=g.nx, ny=g.ny,
                                    method=method, sweeps=2, omega=omega,
                                    strip=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


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


# ---------------------------------------------------------------------------
# parity-plane layout (interpret mode)
# ---------------------------------------------------------------------------


def _dirichlet_fields(n, seed):
    g = Grid(n, n)
    st = st_mod.make_stencil(g, dtype=jnp.float32)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded,
                                  bc_mod.dirichlet())
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32)
                    * np.asarray(unknown))
    u0 = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32)
                     * np.asarray(unknown))
    return g, st, unknown, f, u0


@pytest.mark.parametrize("sweeps,omega", [(1, 1.0), (2, 1.0), (3, 1.3)])
def test_parity_whole_grid_bit_matches_direct(sweeps, omega):
    """The parity-plane body computes the identical arithmetic in the
    identical order as the direct color-masked body — results must be
    BITWISE equal, not merely close (smooth._parity_sweeps contract)."""
    g, st, unknown, f, u0 = _dirichlet_fields(33, 41)
    kw = dict(nx=g.nx, ny=g.ny, method="rbgs", sweeps=sweeps, omega=omega,
              interpret=True)
    direct = psmooth.multisweep(st, u0, f, layout="direct", **kw)
    par = psmooth.multisweep(st, u0, f, layout="parity", **kw)
    assert np.array_equal(np.asarray(direct), np.asarray(par))


@pytest.mark.parametrize("n,strip,sweeps", [(65, 16, 2), (65, 8, 1),
                                            (129, 24, 2)])
def test_parity_strips_bit_matches_direct(n, strip, sweeps):
    """Strip seams, clamped first window and the static tail window must
    all line up between the parity and direct layouts (window starts are
    8-aligned, so plane identity matches global parity everywhere)."""
    g, st, unknown, f, u0 = _dirichlet_fields(n, 43)
    kw = dict(nx=g.nx, ny=g.ny, method="rbgs", sweeps=sweeps, omega=1.0,
              strip=strip, interpret=True)
    direct = psmooth.multisweep_strips(st, u0, f, layout="direct", **kw)
    par = psmooth.multisweep_strips(st, u0, f, layout="parity", **kw)
    assert np.array_equal(np.asarray(direct), np.asarray(par))


def test_parity_matches_xla_smoother():
    """End-to-end: parity kernel vs the XLA RB-GS path (exact at omega=1)."""
    g, st, unknown, f, u0 = _dirichlet_fields(65, 47)
    ref = smooth_mod.smooth(st, u0, f, unknown, method="rbgs", sweeps=2,
                            omega=1.0)
    got = psmooth.multisweep_strips(st, u0, f, nx=g.nx, ny=g.ny,
                                    method="rbgs", sweeps=2, omega=1.0,
                                    strip=16, layout="parity",
                                    interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_parity_preserves_boundary_and_padding():
    g, st, unknown, f, u0 = _dirichlet_fields(33, 53)
    got = np.asarray(psmooth.multisweep(st, u0, f, nx=g.nx, ny=g.ny,
                                        method="rbgs", sweeps=2,
                                        layout="parity", interpret=True))
    assert np.all(got[0, :] == 0) and np.all(got[g.nx - 1, : g.ny] == 0)
    assert np.all(got[:, 0] == 0) and np.all(got[: g.nx, g.ny - 1] == 0)
    assert np.all(got[g.nx:, :] == 0) and np.all(got[:, g.ny:] == 0)


def test_parity_split_merge_roundtrip():
    """_split_parity/_merge_parity are exact inverses on any even-padded
    window (plain jnp ops — runs outside a kernel too)."""
    rng = np.random.default_rng(59)
    x = jnp.asarray(rng.standard_normal((24, 256)).astype(np.float32))
    planes = psmooth._split_parity(x)
    assert planes[0].shape == (12, 128)
    back = psmooth._merge_parity(*planes)
    assert np.array_equal(np.asarray(back), np.asarray(x))
    # plane (a, b) holds x[2i+a, 2j+b]
    xs = np.asarray(x)
    for p, (a, b) in zip(planes, [(0, 0), (0, 1), (1, 0), (1, 1)]):
        assert np.array_equal(np.asarray(p), xs[a::2, b::2])


# ---------------------------------------------------------------------------
# fused transfer kernels (interpret mode)
# ---------------------------------------------------------------------------

from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import (  # noqa: E402
    transfer as transfer_mod,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (  # noqa: E402
    transfer as ptransfer,
)


@pytest.mark.parametrize("n", [65, 129])
def test_fused_residual_restrict_matches_xla(n):
    g = Grid(n, n)
    gc = g.coarsen()
    st = st_mod.make_stencil(g, dtype=jnp.float32)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded,
                                  bc_mod.dirichlet())
    rng = np.random.default_rng(n)
    u = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32))
    f = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32))
    r = st_mod.residual(st, u, f, unknown)
    ref = transfer_mod.restrict(r, gc.nx, gc.ny, gc.shape_padded,
                                method="full_weighting", dtype=jnp.float32)
    got = ptransfer.residual_restrict(
        st, u, f, nxf=g.nx, nyf=g.ny, ncx=gc.nx, ncy=gc.ny,
        pshape_coarse=gc.shape_padded, interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=1e-6)


@pytest.mark.parametrize("n,strip", [(65, 32), (129, 48)])
def test_fused_residual_restrict_varcoef_matches_xla(n, strip):
    """Streamed-coefficient fused kernel vs XLA residual-then-restrict,
    with a 10:1 coefficient jump crossing the strip seams."""
    g, st, unknown, f, u = _varcoef_problem(n, n + 3)
    gc = g.coarsen()
    r = st_mod.residual(st, u, f, unknown)
    ref = transfer_mod.restrict(r, gc.nx, gc.ny, gc.shape_padded,
                                method="full_weighting", dtype=jnp.float32)
    got = ptransfer.residual_restrict(
        st, u, f, nxf=g.nx, nyf=g.ny, ncx=gc.nx, ncy=gc.ny,
        pshape_coarse=gc.shape_padded, strip=strip, interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-6)


@pytest.mark.parametrize("n", [65, 129])
def test_fused_prolong_correct_matches_xla(n):
    g = Grid(n, n)
    gc = g.coarsen()
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded,
                                  bc_mod.dirichlet())
    rng = np.random.default_rng(n + 1)
    u = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32))
    ec = np.zeros(gc.shape_padded, np.float32)
    ec[: gc.nx, : gc.ny] = rng.standard_normal((gc.nx, gc.ny))
    ec = jnp.asarray(ec)
    e = transfer_mod.prolong(ec, gc.nx, gc.ny, g.nx, g.ny, g.shape_padded,
                             dtype=jnp.float32)
    ref = jnp.where(unknown, u + e, u)
    got = ptransfer.prolong_correct(ec, u, ncx=gc.nx, ncy=gc.ny,
                                    nxf=g.nx, nyf=g.ny, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# fused coarse-tail kernel (interpret mode)
# ---------------------------------------------------------------------------

from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (  # noqa: E402
    tail as ptail,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (  # noqa: E402
    multigrid as mg_mod,
)


@pytest.mark.parametrize("symmetric", [False, True])
def test_tail_vcycle_matches_xla_cycle(symmetric):
    n = 65
    cfg = mg_mod.MultigridConfig(smoother="rbgs", omega=1.0, backend="xla",
                                 coarse_sweeps=8, symmetric=symmetric)
    levels = mg_mod.build_hierarchy(Grid(n, n), cfg=cfg, dtype=jnp.float32)
    g = levels[0].grid
    rng = np.random.default_rng(7)
    u = np.zeros(g.shape_padded, np.float32)
    f = np.zeros(g.shape_padded, np.float32)
    u[1:n-1, 1:n-1] = rng.standard_normal((n-2, n-2))
    f[1:n-1, 1:n-1] = rng.standard_normal((n-2, n-2))
    u, f = jnp.asarray(u), jnp.asarray(f)
    ref = mg_mod.mg_cycle(levels, u, f, cfg)
    meta = tuple((lev.grid.nx, lev.grid.ny) + tuple(lev.grid.shape_padded)
                 for lev in levels)
    got = ptail.tail_vcycle(
        [lev.stencil for lev in levels], u, f, meta=meta,
        pre=cfg.pre_sweeps, post=cfg.post_sweeps, omega=cfg.omega,
        method="rbgs", coarse_sweeps=cfg.coarse_sweeps, symmetric=symmetric,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tail_vcycle_jacobi_matches_xla_cycle():
    n = 33
    cfg = mg_mod.MultigridConfig(smoother="jacobi", omega=0.8, backend="xla",
                                 coarse_sweeps=8)
    levels = mg_mod.build_hierarchy(Grid(n, n), cfg=cfg, dtype=jnp.float32)
    g = levels[0].grid
    rng = np.random.default_rng(9)
    f = np.zeros(g.shape_padded, np.float32)
    f[1:n-1, 1:n-1] = rng.standard_normal((n-2, n-2))
    f = jnp.asarray(f)
    u = jnp.zeros_like(f)
    ref = mg_mod.mg_cycle(levels, u, f, cfg)
    meta = tuple((lev.grid.nx, lev.grid.ny) + tuple(lev.grid.shape_padded)
                 for lev in levels)
    got = ptail.tail_vcycle(
        [lev.stencil for lev in levels], u, f, meta=meta,
        pre=cfg.pre_sweeps, post=cfg.post_sweeps, omega=cfg.omega,
        method="jacobi", coarse_sweeps=cfg.coarse_sweeps,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tail_vcycle_var_matches_xla_cycle():
    """Variable-coefficient fused tail (tail_vcycle_var) vs the XLA cycle
    on a smooth + 10:1-jump coefficient hierarchy."""
    n = 65
    g0 = Grid(n, n)
    X, Y = np.meshgrid(np.linspace(0, 1, g0.shape_padded[0]),
                       np.linspace(0, 1, g0.shape_padded[1]), indexing="ij")
    a = 1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(np.pi * Y)
    a = np.where(X > 0.5, 10.0 * a, a).astype(np.float32)
    cfg = mg_mod.MultigridConfig(smoother="rbgs", omega=1.0, backend="xla",
                                 coarse_sweeps=8)
    levels = mg_mod.build_hierarchy(g0, a=jnp.asarray(a), cfg=cfg,
                                    dtype=jnp.float32)
    rng = np.random.default_rng(61)
    u = np.zeros(g0.shape_padded, np.float32)
    f = np.zeros(g0.shape_padded, np.float32)
    u[1:n - 1, 1:n - 1] = rng.standard_normal((n - 2, n - 2))
    f[1:n - 1, 1:n - 1] = rng.standard_normal((n - 2, n - 2))
    u, f = jnp.asarray(u), jnp.asarray(f)
    ref = mg_mod.mg_cycle(levels, u, f, cfg)
    meta = tuple((lev.grid.nx, lev.grid.ny) + tuple(lev.grid.shape_padded)
                 for lev in levels)
    got = ptail.tail_vcycle_var(
        [lev.stencil for lev in levels], u, f, meta=meta,
        pre=cfg.pre_sweeps, post=cfg.post_sweeps, omega=cfg.omega,
        method="rbgs", coarse_sweeps=cfg.coarse_sweeps, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tail_ok_gates_varcoef():
    """dispatch.tail_ok admits variable-coefficient tails for
    backend='pallas' (TAILVAR_AUTO measured separately), still rejects
    Neumann and Galerkin levels."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import dispatch

    n = 65
    g0 = Grid(n, n)
    a = jnp.ones(g0.shape_padded, jnp.float32) * 2.0
    cfg = mg_mod.MultigridConfig(smoother="rbgs", omega=1.0,
                                 backend="pallas")
    levels = mg_mod.build_hierarchy(g0, a=a, cfg=cfg, dtype=jnp.float32)
    assert dispatch.tail_ok(levels, 0, cfg, "V")
    assert not dispatch.tail_ok(levels, 0, cfg.replace(backend="xla"), "V")
    # 'auto' follows the TAILVAR_AUTO gate
    on_tpu = dispatch._on_tpu()
    expected = bool(dispatch.TAILVAR_AUTO and dispatch.TAIL_AUTO and on_tpu)
    assert dispatch.tail_ok(levels, 0, cfg.replace(backend="auto"),
                            "V") == expected
    # Neumann stays rejected
    spec = bc_mod.mixed(west=bc_mod.BCSide(kind=bc_mod.BCKind.NEUMANN))
    lev_n = mg_mod.build_hierarchy(g0, spec, cfg=cfg, dtype=jnp.float32)
    assert not dispatch.tail_ok(lev_n, 0, cfg, "V")


# ---------------------------------------------------------------------------
# 3D rolling-plane pipeline kernel
# ---------------------------------------------------------------------------

def _setup3d(shape, seed=7):
    from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid3d import Grid3D
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import stencil3d as st3

    g = Grid3D(*shape)
    st = st3.make_stencil3d(g, dtype=jnp.float32)
    unknown = st3.unknown_mask3d(g)
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32)
                    * np.asarray(unknown))
    u0 = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32)
                     * np.asarray(unknown))
    return g, st, unknown, f, u0


@pytest.mark.parametrize("shape", [(17, 17, 17), (9, 33, 9)])
@pytest.mark.parametrize("sweeps,omega,reverse", [
    (1, 1.0, False), (2, 1.0, False), (1, 1.3, False), (2, 1.0, True),
])
def test_rbgs_planes_matches_xla(shape, sweeps, omega, reverse):
    """Pipeline kernel == XLA 3D RB-GS, bit-level at fp32 (same op order)."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (
        smooth3d as ps3,
    )
    from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid3d import (
        smooth3d,
    )

    g, st, unknown, f, u0 = _setup3d(shape)
    ref = smooth3d(st, u0, f, unknown, method="rbgs", sweeps=sweeps,
                   omega=omega, reverse=reverse)
    got = ps3.rbgs_planes(st, u0, f, nx=g.nx, ny=g.ny, nz=g.nz,
                          sweeps=sweeps, omega=omega, reverse=reverse,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_rbgs_planes_multistrip_matches_xla():
    """Force y-strips (ystrip=8 -> several windows + halo re-reads)."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (
        smooth3d as ps3,
    )
    from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid3d import (
        smooth3d,
    )

    g, st, unknown, f, u0 = _setup3d((9, 65, 9), seed=13)
    ref = smooth3d(st, u0, f, unknown, method="rbgs", sweeps=2, omega=1.0)
    got = ps3.rbgs_planes(st, u0, f, nx=g.nx, ny=g.ny, nz=g.nz,
                          sweeps=2, omega=1.0, ystrip=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_rbgs_planes_preserves_boundary_and_padding():
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (
        smooth3d as ps3,
    )

    g, st, unknown, f, u0 = _setup3d((17, 17, 17))
    got = np.asarray(ps3.rbgs_planes(st, u0, f, nx=g.nx, ny=g.ny, nz=g.nz,
                                     sweeps=2, interpret=True))
    assert np.all(got[0] == 0) and np.all(got[g.nx - 1, : g.ny, : g.nz] == 0)
    assert np.all(got[:, 0, :] == 0) and np.all(got[: g.nx, g.ny - 1, : g.nz] == 0)
    assert np.all(got[:, :, 0] == 0) and np.all(got[: g.nx, : g.ny, g.nz - 1] == 0)
    # padding region untouched (stays zero)
    assert np.all(got[g.nx:, :, :] == 0)
    assert np.all(got[:, g.ny:, :] == 0)
    assert np.all(got[:, :, g.nz:] == 0)


# ---------------------------------------------------------------------------
# 3D fused transfer kernels
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(17, 17, 17), (9, 33, 9), (33, 9, 17)])
def test_fused_residual_restrict3d_matches_xla(shape):
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import (
        stencil3d as st3,
        transfer3d as t3,
    )
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (
        transfer3d as pt3,
    )

    g, st, unknown, f, u = _setup3d(shape, seed=5)
    gc = g.coarsen()
    r = st3.residual(st, u, f, unknown)
    ref = t3.restrict3d(r, gc.nx, gc.ny, gc.nz, gc.shape_padded,
                        method="full_weighting", dtype=jnp.float32)
    got = pt3.residual_restrict3d(
        st, u, f, nxf=g.nx, nyf=g.ny, nzf=g.nz,
        ncx=gc.nx, ncy=gc.ny, ncz=gc.nz,
        pshape_coarse=gc.shape_padded, interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=1e-6)


@pytest.mark.parametrize("shape", [(17, 17, 17), (9, 33, 9), (33, 9, 17)])
def test_fused_prolong_correct3d_matches_xla(shape):
    from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid3d import Grid3D
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import (
        stencil3d as st3,
        transfer3d as t3,
    )
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (
        transfer3d as pt3,
    )

    g, st, unknown, f, u = _setup3d(shape, seed=8)
    gc = g.coarsen()
    rng = np.random.default_rng(21)
    ec = np.zeros(gc.shape_padded, np.float32)
    ec[: gc.nx, : gc.ny, : gc.nz] = rng.standard_normal(
        (gc.nx, gc.ny, gc.nz)).astype(np.float32)
    ec = jnp.asarray(ec)
    e = t3.prolong3d(ec, gc.nx, gc.ny, gc.nz, g.nx, g.ny, g.nz,
                     g.shape_padded, dtype=jnp.float32)
    ref = jnp.where(unknown, u + e, u)
    got = pt3.prolong_correct3d(
        ec, u, ncx=gc.nx, ncy=gc.ny, ncz=gc.nz,
        nxf=g.nx, nyf=g.ny, nzf=g.nz, interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=1e-6)


# ---------------------------------------------------------------------------
# dispatch gating (size-gated streamed-coefficient smoothing, round 4)
# ---------------------------------------------------------------------------


def test_varcoef_smooth_gate_is_size_gated(monkeypatch):
    """VARCOEF_AUTO routes streamed-coefficient smoothing to the kernel only
    at levels >= _VARCOEF_MIN_BYTES (1 MB since round 5: both guarded
    sessions say the kernel wins at 513^2; 257^2 and below stay XLA —
    ops/dispatch.py policy comment)."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import dispatch
    from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (
        multigrid as mg_mod,
    )

    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    assert dispatch.VARCOEF_AUTO  # round-4 setting

    def lev0(n):
        g = Grid(n, n)
        a = jnp.ones(g.shape_padded, jnp.float32) * 2.0
        cfg = mg_mod.MultigridConfig(smoother="rbgs", omega=1.0)
        return mg_mod.build_hierarchy(g, a=a, cfg=cfg, dtype=jnp.float32)[0]

    small = lev0(129)
    u_small = jnp.zeros(small.grid.shape_padded, jnp.float32)
    assert u_small.size * 4 < dispatch._VARCOEF_MIN_BYTES
    assert not dispatch._pallas_smooth_ok(small.stencil, u_small, small,
                                          "auto", "rbgs")
    # backend='pallas' bypasses the size gate (explicit opt-in)
    assert dispatch._pallas_smooth_ok(small.stencil, u_small, small,
                                      "pallas", "rbgs")

    big = lev0(1025)
    u_big = jnp.zeros(big.grid.shape_padded, jnp.float32)
    assert u_big.size * 4 >= dispatch._VARCOEF_MIN_BYTES
    assert dispatch._pallas_smooth_ok(big.stencil, u_big, big, "auto",
                                      "rbgs")
    # scalar stencils are unaffected by the varcoef size gate
    st_scalar = st_mod.make_stencil(small.grid, dtype=jnp.float32)
    lev_s = mg_mod.Level(stencil=st_scalar, grid=small.grid, spec=small.spec,
                         dtype=np.dtype(np.float32))
    assert dispatch._pallas_smooth_ok(st_scalar, u_small, lev_s, "auto",
                                      "rbgs")


@pytest.mark.parametrize("mixed_kinds", [
    {"east": "neumann"},
    {"west": "neumann", "north": "neumann"},
    {"south": "robin"},
])
def test_fused_transfers_neumann_reflect_match_xla(mixed_kinds):
    """Neumann/Robin sides through the fused pair (VERDICT r4 next-round
    #3: widen fused-transfer coverage to the reflect path): per-side
    Dirichlet flags extend the kernel masks, reflect folds replace the
    zero boundary, and the streamed coefficient planes carry the ghost
    elimination. Must match the XLA residual->restrict(reflect) and
    prolong->masked-correct chain exactly."""
    kinds = {k: (bc_mod.BCSide(kind=bc_mod.BCKind.ROBIN, alpha=1.0,
                               beta=1.0) if v == "robin"
                 else bc_mod.BCSide(kind=bc_mod.BCKind.NEUMANN))
             for k, v in mixed_kinds.items()}
    spec = bc_mod.BoundarySpec(**kinds)
    n = 65
    g = Grid(n, n)
    gc = g.coarsen()
    st = st_mod.make_stencil(g, spec, dtype=jnp.float32)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded, spec)
    unknown_c = bc_mod.unknown_mask(gc.nx, gc.ny, gc.shape_padded, spec)
    sides = tuple(spec.side(s).kind == bc_mod.BCKind.DIRICHLET
                  for s in bc_mod.SIDES)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32))
    f = jnp.asarray(rng.standard_normal(g.shape_padded).astype(np.float32))

    # residual + restrict, reflect boundary (solvers/multigrid._cycle path)
    r = st_mod.residual(st, u, f, unknown)
    ref = transfer_mod.restrict(r, gc.nx, gc.ny, gc.shape_padded,
                                method="full_weighting", boundary="reflect",
                                dtype=jnp.float32)
    ref = jnp.where(unknown_c, ref, jnp.zeros((), jnp.float32))
    got = ptransfer.residual_restrict(
        st, u, f, nxf=g.nx, nyf=g.ny, ncx=gc.nx, ncy=gc.ny,
        pshape_coarse=gc.shape_padded, sides=sides, interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-6)

    # prolong + correct on the widened unknown set
    ec = np.zeros(gc.shape_padded, np.float32)
    ec[: gc.nx, : gc.ny] = rng.standard_normal((gc.nx, gc.ny))
    ec = jnp.asarray(np.where(np.asarray(unknown_c), ec, 0.0))
    e = transfer_mod.prolong(ec, gc.nx, gc.ny, g.nx, g.ny, g.shape_padded,
                             dtype=jnp.float32)
    ref_u = jnp.where(unknown, u + e, u)
    got_u = ptransfer.prolong_correct(ec, u, ncx=gc.nx, ncy=gc.ny,
                                      nxf=g.nx, nyf=g.ny, sides=sides,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u),
                               rtol=1e-5, atol=1e-5)


def test_neumann_solve_routes_fused_transfers(monkeypatch):
    """End-to-end: backend='pallas' on a Neumann problem routes the fused
    transfer pair (smoothing and tail stay XLA — their gates still require
    all-Dirichlet) and must reproduce the XLA solve."""
    import functools

    import mixed_precision_multigrid_solvers_for_pdes_tpu as mg
    from mixed_precision_multigrid_solvers_for_pdes_tpu.models import (
        problems as P,
    )
    from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (
        MultigridConfig,
    )

    monkeypatch.setattr(ptransfer, "residual_restrict",
                        functools.partial(ptransfer.residual_restrict,
                                          interpret=True))
    monkeypatch.setattr(ptransfer, "prolong_correct",
                        functools.partial(ptransfer.prolong_correct,
                                          interpret=True))
    prob = P.neumann_test_problem(257)  # >= _MIN_TRANSFER_BYTES padded
    f = prob.rhs(jnp.float32)
    u0 = prob.initial_guess(jnp.float32)
    results = {}
    for backend in ("xla", "pallas"):
        cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-5,
                              backend=backend)
        levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float32",
                                    cfg=cfg)
        from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import (
            dispatch,
        )

        if backend == "pallas":
            assert dispatch.transfer_fused_ok(levels[0], levels[1], cfg)
        results[backend] = mg.mg_solve(levels, f, u0, cfg)
    u_x, info_x = results["xla"]
    u_p, info_p = results["pallas"]
    assert info_p["converged"]
    assert abs(info_p["iterations"] - info_x["iterations"]) <= 1
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x),
                               atol=5e-5)
