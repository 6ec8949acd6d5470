"""Robust two-K marginal-cost protocol for the axon-tunneled TPU.

The tunnel adds a FIXED ~27 ms dispatch+readback cost to every program
execution, with run-to-run jitter that can reach hundreds of microseconds.
The plain two-K difference ((t_hi - t_lo) / dk) therefore goes NOISE-DOMINATED
— and can go negative — whenever dk * per_iter_cost is comparable to the
jitter (round-3 shipped gate_microbench rows of -4..-130 us this way;
VERDICT.md r3 weak #2). This module guards the protocol:

- t(k) is the MEDIAN of >= `repeats` wall times (fresh inputs per repeat —
  the relay caches identical (executable, args) executions);
- the measured noise floor is the median absolute deviation of those repeats
  (robust to a single straggler);
- the K spread auto-widens (x4) until the K-difference clears
  `min_snr` x the combined noise floor, up to `max_dk`;
- the result records the noise floor and an `ok` flag; a delta that never
  cleared the floor is flagged instead of shipped as a signed number, and
  negative-but-within-noise deltas clamp to 0.0 with ok=False.

Chained iterations must carry a real data dependency (e.g. perturb an input
by `1e-30 * i`) so XLA cannot hoist the loop body.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import numpy as np


@dataclasses.dataclass
class Marginal:
    """Result of a guarded two-K marginal measurement (all times seconds)."""

    per_iter: float          # marginal cost per chained iteration (>= 0)
    noise_floor: float       # combined MAD of the repeat populations
    delta: float             # raw t_hi - t_lo (may be negative if not ok)
    dk: int                  # final K spread used
    ok: bool                 # delta cleared min_snr x noise_floor

    def to_dict(self):
        return {
            "per_iter_s": self.per_iter,
            "noise_floor_s": self.noise_floor,
            "dk": self.dk,
            "ok": self.ok,
        }


def _sync(out):
    """Force completion by READBACK, not block_until_ready: on the axon
    tunnel block_until_ready can return before remote execution finishes
    (measured 2026-08-20: a 64-sweep kernel 'blocked' in 0.10 ms and only a
    device_get paid the real compute), which silently zeroes marginals."""
    jax.tree_util.tree_map(jax.device_get, out)


def _timed_median(fn, make_args, repeats: int):
    """Median wall time + MAD over `repeats` runs with fresh inputs."""
    out = fn(*make_args())
    _sync(out)  # compile outside the timed region
    ts = []
    for _ in range(repeats):
        args = make_args()
        _sync(args)
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    med = float(np.median(ts))
    mad = float(np.median(np.abs(ts - med)))
    return med, mad


def _timed_median_pair(fn_lo, fn_hi, make_args, repeats: int):
    """Interleaved medians for two callables: repeats alternate lo/hi so the
    two populations are temporally adjacent and session drift (documented up
    to ~3x between populations) cancels out of the difference instead of
    being attributed to per-iteration cost (ADVICE r4: a long widening loop
    reusing a stale t_lo could report drift as ok=True)."""
    _sync(fn_lo(*make_args()))  # compile both outside the timed region
    _sync(fn_hi(*make_args()))
    ts_lo, ts_hi = [], []
    for _ in range(repeats):
        for fn, ts in ((fn_lo, ts_lo), (fn_hi, ts_hi)):
            args = make_args()
            _sync(args)
            t0 = time.perf_counter()
            out = fn(*args)
            _sync(out)
            ts.append(time.perf_counter() - t0)

    def _med_mad(ts):
        ts = np.asarray(ts)
        med = float(np.median(ts))
        return med, float(np.median(np.abs(ts - med)))

    return _med_mad(ts_lo) + _med_mad(ts_hi)


def robust_marginal(
    make_chain: Callable[[int], Callable],
    make_args: Callable[[], tuple],
    *,
    k_lo: int = 64,
    dk: int = 64,
    max_dk: int = 16384,
    repeats: int = 5,
    min_snr: float = 4.0,
) -> Marginal:
    """Guarded per-iteration cost of `make_chain(k)` via the two-K protocol.

    `make_chain(k)` returns a jitted callable running k chained iterations;
    `make_args()` returns fresh inputs. Widens the K spread until the
    difference clears `min_snr` x the measured noise floor (or `max_dk` is
    hit, in which case the result is flagged not-ok rather than shipped as
    a bare number).
    """
    fn_lo = make_chain(k_lo)
    while True:
        # lo is re-measured interleaved with hi at EVERY K spread so each
        # delta compares temporally adjacent populations (session drift
        # otherwise masquerades as per-iteration cost)
        t_lo, mad_lo, t_hi, mad_hi = _timed_median_pair(
            fn_lo, make_chain(k_lo + dk), make_args, repeats)
        delta = t_hi - t_lo
        noise = mad_lo + mad_hi
        if delta >= min_snr * noise and delta > 0:
            return Marginal(delta / dk, noise, delta, dk, True)
        if dk >= max_dk:
            return Marginal(max(0.0, delta) / dk, noise, delta, dk, False)
        dk = min(4 * dk, max_dk)


def check_rows(results: dict) -> list:
    """Return the keys of any negative or not-ok numeric rows (for asserts)."""
    bad = []
    for name, row in results.items():
        if not isinstance(row, dict):
            continue
        for k, v in row.items():
            if isinstance(v, (int, float)) and v < 0:
                bad.append(f"{name}.{k}")
            if isinstance(v, dict) and v.get("ok") is False:
                bad.append(f"{name}.{k}")
    return bad
