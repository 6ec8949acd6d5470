"""Grid metadata tests (counterpart of reference tests/unit/test_grid.py)."""

import numpy as np
import pytest

from mixed_precision_multigrid_solvers_for_pdes_tpu.core.grid import (
    Grid,
    padded_shape,
)


def test_construction_and_spacing():
    g = Grid(33, 65, (0.0, 1.0, 0.0, 2.0))
    assert g.shape == (33, 65)
    assert g.hx == pytest.approx(1.0 / 32)
    assert g.hy == pytest.approx(2.0 / 64)
    assert g.num_points == 33 * 65
    assert g.num_interior == 31 * 63


def test_padded_shape_alignment():
    assert padded_shape(129, 129) == (144, 256)
    assert padded_shape(3, 3) == (16, 128)
    assert padded_shape(1025, 1025) == (1040, 1152)
    for n in (17, 33, 129):
        px, py = padded_shape(n, n)
        assert px % 16 == 0 and py % 128 == 0 and px >= n and py >= n


def test_coarsen_refine_roundtrip():
    g = Grid(129, 129)
    gc = g.coarsen()
    assert gc.shape == (65, 65)
    assert gc.hx == pytest.approx(2 * g.hx)
    assert gc.refine().shape == g.shape
    # coarsening chain bottoms out at 3
    while g.can_coarsen():
        g = g.coarsen()
    assert g.shape == (3, 3)


def test_coarsen_invalid():
    with pytest.raises(ValueError):
        Grid(4, 4).coarsen()
    assert not Grid(3, 3).can_coarsen()
    with pytest.raises(ValueError):
        Grid(2, 2)


def test_coordinates_and_padding():
    g = Grid(17, 17)
    X, Y = g.coordinates()
    assert X.shape == (17, 17)
    assert X[0, 0] == 0.0 and X[-1, 0] == 1.0 and Y[0, -1] == 1.0
    field = X + Y
    padded = g.pad_field(field)
    assert padded.shape == g.shape_padded
    np.testing.assert_array_equal(g.unpad_field(padded), field)
    assert np.all(padded[17:, :] == 0) and np.all(padded[:, 17:] == 0)
