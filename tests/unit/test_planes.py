"""HBM-resident parity-plane layout (ops/planes.py, pallas_kernels/
smooth_planes.py, solvers/plane_solve.py): split/merge exactness, plane
algebra vs the standard formulations, kernel bit-parity in interpret mode,
and the full plane-resident IR solve vs refinement.ir_solve.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import mixed_precision_multigrid_solvers_for_pdes_tpu as mg
from mixed_precision_multigrid_solvers_for_pdes_tpu.core import bc as bc_mod
from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import (
    planes as pln,
    smooth as smooth_mod,
    stencil as st_mod,
    transfer as transfer_mod,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops.pallas_kernels import (
    smooth_planes as psp,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (
    plane_solve,
    refinement,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (
    MultigridConfig,
)


def _field(g, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(g.shape_padded).astype(dtype))


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_split_merge_roundtrip(dtype):
    g = Grid(65, 65)
    u = _field(g, dtype)
    planes = pln.split_field(u)
    # plane (a, b) holds u[2i+a, 2j+b] at the origin; the plane array
    # carries its own (8, 128) tile padding (zeros) beyond that
    assert planes.shape[1:] == pln.plane_shape(g.shape_padded)
    un = np.asarray(u)
    for k, (a, b) in enumerate(pln.PLANE_ORDER):
        blk = un[a::2, b::2]
        got = np.asarray(planes[k])
        np.testing.assert_array_equal(got[: blk.shape[0], : blk.shape[1]],
                                      blk)
        assert not got[blk.shape[0]:, :].any()
        assert not got[:, blk.shape[1]:].any()
    back = pln.merge_field(planes, g.shape_padded)
    np.testing.assert_array_equal(np.asarray(back), un)


def test_plane_residual_matches_standard():
    g = Grid(65, 65)
    st = st_mod.make_stencil(g, dtype=jnp.float32)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded,
                                  bc_mod.dirichlet())
    u, f = _field(g, seed=1), _field(g, seed=2)
    ref = st_mod.residual(st, u, f, unknown)
    stp = tuple(jnp.asarray(getattr(st, k), jnp.float32)
                for k in ("c", "w", "e", "s", "n"))
    rp = pln.plane_residual(stp, pln.split_field(u), pln.split_field(f),
                            pln.plane_masks(g))
    got = pln.merge_field(rp, g.shape_padded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_restrict_planes_matches_standard():
    g = Grid(65, 65)
    gc = g.coarsen()
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded,
                                  bc_mod.dirichlet())
    r = jnp.where(unknown, _field(g, seed=3), 0.0)
    ref = transfer_mod.restrict(r, gc.nx, gc.ny, gc.shape_padded,
                                method="full_weighting", boundary="zero",
                                dtype=jnp.float32)
    got = pln.restrict_planes(pln.split_field(r), gc.nx, gc.ny,
                              gc.shape_padded, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_prolong_correct_planes_matches_standard():
    g = Grid(65, 65)
    gc = g.coarsen()
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded,
                                  bc_mod.dirichlet())
    unknown_c = bc_mod.unknown_mask(gc.nx, gc.ny, gc.shape_padded,
                                    bc_mod.dirichlet())
    u = _field(g, seed=4)
    ec = jnp.where(unknown_c, _field(gc, seed=5), 0.0)
    e = transfer_mod.prolong(ec, gc.nx, gc.ny, g.nx, g.ny, g.shape_padded,
                             dtype=jnp.float32)
    ref = jnp.where(unknown, u + e, u)
    up = pln.prolong_correct_planes(ec, pln.split_field(u),
                                    pln.plane_masks(g))
    got = pln.merge_field(up, g.shape_padded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("force_strips", [False, True])
def test_multisweep_planes_bit_matches_xla(monkeypatch, force_strips):
    """The plane kernel's sweep bodies are arithmetically identical to the
    XLA RB-GS smoother (same operand order as smooth._parity_sweeps, whose
    bit-exactness is hardware-validated) — interpret mode must match
    exactly."""
    if force_strips:
        monkeypatch.setattr(psp, "WHOLE_PLANES_BYTES", 0)
    g = Grid(65, 65)
    st = st_mod.make_stencil(g, dtype=jnp.float32)
    unknown = bc_mod.unknown_mask(g.nx, g.ny, g.shape_padded,
                                  bc_mod.dirichlet())
    u, f = _field(g, seed=6), _field(g, seed=7)
    ref = smooth_mod.smooth(st, u, f, unknown, method="rbgs", sweeps=2,
                            omega=1.0)
    up = psp.multisweep_planes(st, pln.split_field(u), pln.split_field(f),
                               nx=g.nx, ny=g.ny, sweeps=2, omega=1.0,
                               strip=16, interpret=True)
    got = pln.merge_field(up, g.shape_padded)
    np.testing.assert_array_equal(
        np.asarray(got)[:g.nx, :g.ny], np.asarray(ref)[:g.nx, :g.ny])


def test_plane_ir_solve_matches_refinement():
    """Full plane-resident solve vs the standard IR path (both without
    FMG): identical outer-iteration count, same solution to fp32-correction
    accuracy, MMS error at the discretization level."""
    from mixed_precision_multigrid_solvers_for_pdes_tpu.models import (
        problems as P,
    )

    prob = P.poisson_mms_sinsin(65)
    cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-9,
                          backend="xla")
    levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float32",
                                cfg=cfg)
    f = prob.rhs(jnp.float64)
    u0 = prob.initial_guess(jnp.float64)
    u_ref, info_ref = refinement.ir_solve(levels, f, u0, cfg,
                                          inner_cycles=2, use_fmg=False)
    u_p, info_p = plane_solve.plane_ir_solve(levels, f, u0, cfg,
                                             inner_cycles=2,
                                             interpret=True)
    assert info_p["converged"]
    assert abs(info_p["iterations"] - info_ref["iterations"]) <= 1
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_ref),
                               rtol=0, atol=1e-7)
    assert prob.error_norms(u_p)["l2"] < 2e-4  # 65^2 disc. floor


def test_plane_gate_rejects_outside_configs():
    from mixed_precision_multigrid_solvers_for_pdes_tpu.models import (
        problems as P,
    )

    cfg = MultigridConfig(smoother="rbgs", omega=1.0, backend="xla")
    prob = P.poisson_mms_sinsin(33)
    levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float32",
                                cfg=cfg)
    assert plane_solve.plane_solve_ok(levels, cfg)
    assert not plane_solve.plane_solve_ok(levels, cfg.replace(cycle="W"))
    levels64 = mg.build_hierarchy(prob.grid, prob.spec, dtype="float64",
                                  cfg=cfg)
    assert not plane_solve.plane_solve_ok(levels64, cfg)
    neu = P.neumann_test_problem(33)
    levels_n = mg.build_hierarchy(neu.grid, neu.spec, dtype="float32",
                                  cfg=cfg)
    assert not plane_solve.plane_solve_ok(levels_n, cfg)
