"""Preconditioner combinators: identity, composite, adaptive.

Counterpart of reference preconditioning/base.py:15-244 (BasePreconditioner /
IdentityPreconditioner / CompositePreconditioner / AdaptivePreconditioner),
but preconditioners here are plain pure callables z = M(r) — no setup/apply
object protocol, because jit closes over the stencil data anyway.
"""

from __future__ import annotations

from typing import Callable, List, Sequence


def identity() -> Callable:
    """M = I (reference base.py:83)."""

    def apply(r):
        return r

    return apply


def composite(*ms: Callable) -> Callable:
    """Multiplicative composition: z = M_k(...M_1(r)) — each stage refines the
    previous stage's output (reference base.py:104 chains the same way)."""

    def apply(r):
        z = r
        for m in ms:
            z = m(z)
        return z

    return apply


class AdaptivePreconditioner:
    """Host-side adaptive switcher (reference base.py:155): tracks the
    convergence rate of recent outer iterations and switches to the next
    candidate when progress stalls. Use between jitted Krylov *segments* —
    the active preconditioner is static within a segment.
    """

    def __init__(self, candidates: Sequence[Callable], window: int = 5,
                 stall_ratio: float = 0.9):
        if not candidates:
            raise ValueError("need at least one candidate")
        self.candidates: List[Callable] = list(candidates)
        self.active = 0
        self.window = window
        self.stall_ratio = stall_ratio
        self.switches: List[int] = []

    @property
    def current(self) -> Callable:
        return self.candidates[self.active]

    def observe(self, history) -> bool:
        """Feed a residual history; returns True if the active preconditioner
        was switched."""
        import numpy as np

        h = np.asarray(history, dtype=float)
        h = h[np.isfinite(h) & (h > 0)]
        if h.size < self.window + 1:
            return False
        ratios = h[-self.window:] / h[-self.window - 1: -1]
        if np.mean(ratios) > self.stall_ratio and self.active + 1 < len(self.candidates):
            self.active += 1
            self.switches.append(self.active)
            return True
        return False
