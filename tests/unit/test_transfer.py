"""Transfer-operator invariants (reference tests/unit/test_operators.py:200-328)."""

import jax.numpy as jnp
import numpy as np

from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import Grid
from mixed_precision_multigrid_solvers_for_pdes_tpu.ops import transfer


def _grids(nf):
    gf = Grid(nf, nf)
    gc = gf.coarsen()
    return gf, gc


def test_restrict_preserves_constant_interior():
    gf, gc = _grids(17)
    rf = jnp.asarray(gf.pad_field(np.ones((17, 17))))
    for method in ("full_weighting", "half_weighting", "injection"):
        rc = transfer.restrict(rf, gc.nx, gc.ny, gc.shape_padded, method=method)
        np.testing.assert_allclose(
            np.asarray(rc)[1 : gc.nx - 1, 1 : gc.ny - 1], 1.0, rtol=1e-6
        )


def test_restrict_reflect_preserves_constant_everywhere():
    gf, gc = _grids(17)
    rf = jnp.asarray(gf.pad_field(np.ones((17, 17))))
    rc = transfer.restrict(
        rf, gc.nx, gc.ny, gc.shape_padded, boundary="reflect"
    )
    np.testing.assert_allclose(np.asarray(rc)[: gc.nx, : gc.ny], 1.0, rtol=1e-6)


def test_restrict_injection_samples():
    gf, gc = _grids(17)
    X, Y = gf.coordinates()
    rf = jnp.asarray(gf.pad_field(X + 10 * Y))
    rc = transfer.restrict(rf, gc.nx, gc.ny, gc.shape_padded, method="injection")
    Xc, Yc = gc.coordinates()
    np.testing.assert_allclose(
        np.asarray(rc)[1 : gc.nx - 1, 1 : gc.ny - 1],
        (Xc + 10 * Yc)[1:-1, 1:-1],
        rtol=1e-6,
    )


def test_prolong_constant_and_linear_exact():
    gf, gc = _grids(17)
    Xc, Yc = gc.coordinates()
    for field, exact in (
        (np.ones((gc.nx, gc.ny)), lambda X, Y: np.ones_like(X)),
        (Xc + 2 * Yc, lambda X, Y: X + 2 * Y),
    ):
        ec = jnp.asarray(gc.pad_field(field))
        ef = transfer.prolong(
            ec, gc.nx, gc.ny, gf.nx, gf.ny, gf.shape_padded
        )
        Xf, Yf = gf.coordinates()
        np.testing.assert_allclose(
            np.asarray(ef)[: gf.nx, : gf.ny], exact(Xf, Yf), atol=1e-6
        )


def test_prolong_injection_zero_fill():
    gf, gc = _grids(9)
    ec = jnp.asarray(gc.pad_field(np.ones((gc.nx, gc.ny))))
    ef = np.asarray(
        transfer.prolong(ec, gc.nx, gc.ny, gf.nx, gf.ny, gf.shape_padded,
                         method="injection")
    )
    assert np.all(ef[0 : gf.nx : 2, 0 : gf.ny : 2] == 1.0)
    assert np.all(ef[1 : gf.nx : 2, :] == 0.0)


def test_transfer_adjointness_interior():
    # <R r, e>_c == <r, P e>_f / 4 for fields vanishing on the rings
    # (full weighting = bilinear^T / 4 in 2D)
    rng = np.random.default_rng(0)
    gf, gc = _grids(33)
    r = np.zeros((gf.nx, gf.ny))
    r[1:-1, 1:-1] = rng.standard_normal((gf.nx - 2, gf.ny - 2))
    e = np.zeros((gc.nx, gc.ny))
    e[1:-1, 1:-1] = rng.standard_normal((gc.nx - 2, gc.ny - 2))
    rf = jnp.asarray(gf.pad_field(r))
    ec = jnp.asarray(gc.pad_field(e))
    Rr = np.asarray(transfer.restrict(rf, gc.nx, gc.ny, gc.shape_padded))
    Pe = np.asarray(
        transfer.prolong(ec, gc.nx, gc.ny, gf.nx, gf.ny, gf.shape_padded)
    )
    lhs = np.sum(Rr[: gc.nx, : gc.ny] * e)
    rhs = np.sum(np.asarray(rf)[: gf.nx, : gf.ny] * Pe[: gf.nx, : gf.ny]) / 4.0
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_padding_stays_zero():
    gf, gc = _grids(17)
    rf = jnp.asarray(gf.pad_field(np.ones((17, 17))))
    rc = np.asarray(transfer.restrict(rf, gc.nx, gc.ny, gc.shape_padded))
    assert np.all(rc[gc.nx :, :] == 0) and np.all(rc[:, gc.ny :] == 0)
    ec = jnp.asarray(gc.pad_field(np.ones((gc.nx, gc.ny))))
    ef = np.asarray(
        transfer.prolong(ec, gc.nx, gc.ny, gf.nx, gf.ny, gf.shape_padded)
    )
    assert np.all(ef[gf.nx :, :] == 0) and np.all(ef[:, gf.ny :] == 0)


def test_mxu_restrict_matches_parity_path():
    """The TPU fast path (sublane reshape + MXU selection matmul) must agree
    with the parity-plane ground truth to fp32 rounding. Runs the private
    functions directly so the CPU suite covers the TPU-only dispatch branch."""
    gf, gc = _grids(129)
    pxf, pyf = gf.shape_padded
    rng = np.random.default_rng(7)
    rf = np.zeros((pxf, pyf), np.float32)
    rf[: gf.nx, : gf.ny] = rng.standard_normal((gf.nx, gf.ny))
    rf = jnp.asarray(rf)
    for full in (True, False):
        a = np.asarray(transfer._restrict_interior_fine(
            rf, jnp.float32, full=full))
        b = np.asarray(transfer._restrict_interior_parity(
            rf, gc.nx, gc.ny, jnp.float32, full=full))
        sl = np.s_[1 : gc.nx - 1, 1 : gc.ny - 1]
        assert np.max(np.abs(a[sl] - b[sl])) < 1e-6


def test_mxu_prolong_matches_repeat_path():
    gf, gc = _grids(129)
    pxf, pyf = gf.shape_padded
    pxc, pyc = gc.shape_padded
    rng = np.random.default_rng(8)
    ec = np.zeros((pxc, pyc), np.float32)
    ec[: gc.nx, : gc.ny] = rng.standard_normal((gc.nx, gc.ny))
    ec = jnp.asarray(ec)
    pm = np.asarray(transfer._prolong_matmul(
        ec, gc.nx, gc.ny, gf.nx, gf.ny, (pxf, pyf), jnp.float32))
    pr = np.asarray(transfer.prolong(
        ec, gc.nx, gc.ny, gf.nx, gf.ny, (pxf, pyf)))
    assert np.max(np.abs(pm - pr)) < 1e-6
    # padding must stay clean without a post-masking pass
    assert np.max(np.abs(pm[gf.nx:, :])) == 0.0
    assert np.max(np.abs(pm[:, gf.ny:])) == 0.0
