"""Theoretical convergence analysis: smoothing factors, two-grid factors,
h-independence.

Counterpart of reference validation/convergence_analysis.py:44-654
(ConvergenceValidator / TheoreticalAnalyzer: Fourier smoothing analysis,
predicted factors, two-grid validation). The local Fourier analysis (LFA)
numbers here are computed from the actual symbols, not hardcoded.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import norms, stencil as st_mod
from ..solvers import multigrid as mg_mod
from ..solvers.multigrid import MultigridConfig


class TheoreticalAnalyzer:
    """LFA smoothing factors for the 5-point Laplacian
    (reference convergence_analysis.py:97-133 tabulates GS~0.5, wJac~0.6;
    here they are evaluated from the smoother symbols on a frequency grid)."""

    def __init__(self, n_theta: int = 257):
        # full symbol grid over [-pi, pi]^2; high frequencies are the modes
        # NOT representable on the coarse grid: max(|tx|, |ty|) >= pi/2
        t = np.linspace(-np.pi, np.pi, n_theta)
        tx, ty = np.meshgrid(t, t, indexing="ij")
        high = np.maximum(np.abs(tx), np.abs(ty)) >= np.pi / 2
        self.tx, self.ty, self.high = tx, ty, high

    def jacobi_smoothing_factor(self, omega: float = 0.8) -> float:
        """mu = max_high |1 - omega/2 (2 - cos tx - cos ty)| (hx=hy).
        omega=4/5 gives the textbook 3/5."""
        sym = 1.0 - omega * 0.5 * (2.0 - np.cos(self.tx) - np.cos(self.ty))
        return float(np.max(np.abs(sym[self.high])))

    def gs_lex_smoothing_factor(self) -> float:
        """Lexicographic GS: mu = max_high |e^{i tx}+e^{i ty}| / |4 - e^{-i tx} - e^{-i ty}|
        (classical result: 0.5 at (pi/2, arccos(4/5)))."""
        num = np.abs(np.exp(1j * self.tx) + np.exp(1j * self.ty))
        den = np.abs(4.0 - np.exp(-1j * self.tx) - np.exp(-1j * self.ty))
        sym = num / den
        return float(np.max(sym[self.high]))

    def predicted_two_grid_factor(self, smoother: str = "rbgs", nu: int = 2,
                                  omega: Optional[float] = None) -> float:
        """Crude two-grid bound: mu^nu (smoothing-only estimate; RB-GS uses
        the standard measured value mu~0.25 for nu accounting,
        reference docs/methodology.md semantics)."""
        if smoother == "jacobi":
            mu = self.jacobi_smoothing_factor(0.8 if omega is None else omega)
        elif smoother in ("rbgs", "sor", "gauss_seidel", "red_black"):
            mu = 0.25  # classical RB-GS smoothing factor for 5-point Poisson
        else:
            raise ValueError(smoother)
        return float(mu**nu)


def measure_two_grid_factor(
    levels,
    cfg: MultigridConfig = MultigridConfig(smoother="rbgs", omega=1.0),
    *,
    n_cycles: int = 12,
    seed: int = 0,
) -> Dict[str, Any]:
    """Measure the asymptotic error-reduction factor per cycle on A e = 0 from
    a random initial error — the standard numerical two-grid/multigrid factor
    experiment (reference convergence_analysis.py two-grid validation).

    Returns per-cycle error ratios and their geometric tail mean.
    """
    lev0 = levels[0]
    g = lev0.grid
    key = jax.random.PRNGKey(seed)
    e = jax.random.normal(key, g.shape_padded, dtype=lev0.dtype)
    e = jnp.where(lev0.unknown, e, jnp.zeros((), lev0.dtype))
    f = jnp.zeros(g.shape_padded, lev0.dtype)

    @jax.jit
    def cycle(e):
        e = mg_mod.mg_cycle(levels, e, f, cfg)
        return e, norms.scaled_l2(e, g.hx, g.hy)

    hist = [float(norms.scaled_l2(e, g.hx, g.hy))]
    for _ in range(n_cycles):
        e, nrm = cycle(e)
        hist.append(float(nrm))
    h = np.asarray(hist)
    ratios = h[1:] / np.maximum(h[:-1], 1e-300)
    tail = ratios[len(ratios) // 2:]
    rho = float(np.exp(np.mean(np.log(np.maximum(tail, 1e-300)))))
    return {"history": h, "ratios": ratios, "rho": rho}


def validate_h_independence(
    problem_factory,
    sizes=(33, 65, 129),
    cfg: MultigridConfig = MultigridConfig(smoother="rbgs", omega=1.0),
    *,
    dtype="float64",
    tolerance: float = 0.1,
) -> Dict[str, Any]:
    """Measured cycle factors must not grow with the grid
    (reference convergence_analysis.py h-independence validation;
    docs/results.md:114 claims 6 +/- 0.2 iterations across sizes)."""
    import mixed_precision_multigrid_solvers_for_pdes_tpu as mg

    rhos = {}
    for n in sizes:
        prob = problem_factory(n)
        levels = mg.build_hierarchy(prob.grid, prob.spec, a=prob.a,
                                    lam=prob.lam, dtype=dtype, cfg=cfg)
        rhos[n] = measure_two_grid_factor(levels, cfg)["rho"]
    vals = np.array(list(rhos.values()))
    return {
        "rhos": rhos,
        "max_rho": float(vals.max()),
        "spread": float(vals.max() - vals.min()),
        "h_independent": bool(vals.max() - vals.min() <= tolerance),
    }
