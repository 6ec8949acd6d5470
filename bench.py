"""Headline benchmark: 1025^2 Poisson to 1e-9 relative residual on one chip.

Mixed-precision solve (fp32 RB-GS V(2,2) cycles + fp64-accumulated residuals
via iterative refinement) — the configuration the reference benchmarks as
"GPU mixed precision 1025^2" (reference docs/results.md:271,286-292: 8.76 s
fp32 / 11.23 s mixed on an A100, final accuracy 2.7e-9).

Methodology — sustained throughput over a batch of solves. The axon tunnel
used for this environment adds a FIXED ~27 ms dispatch+readback cost to every
program execution (measured; see reports/roofline.md note) — an artifact of
the RPC tunnel, not of the framework or the chip: on a directly-attached TPU
VM per-dispatch overhead is tens of microseconds. A single 1025^2 solve
computes in ~10 ms, so single-call wall time would be ~73% tunnel artifact.
The bench therefore chains K independent solves (distinct right-hand sides,
each a full iterative-refinement solve from a zero guess — nothing is shared
or reusable between them) inside ONE jitted program via lax.scan and reports
wall/K per solve. Inputs differ per repeat as well (the tunnel relay caches
identical (executable, args) executions).

Note on tolerance: at 1025^2 the float64 evaluation floor of the residual is
~4e-10 relative (eps64 * ||A|| * ||u|| / ||f||); 1e-9 is the tightest target
honestly reachable without compensated accumulation, and is ~3x tighter than
the reference's reported mixed-precision final accuracy.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares DoF/s against the reference's claimed A100 fp32 solve
(1025^2 / 8.76 s = 1.195e5 DoF/s, reference docs/results.md:271).

Usage: python bench.py [n] [batch_k]   (defaults: 1025 16)
"""

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import mixed_precision_multigrid_solvers_for_pdes_tpu as mg
    from mixed_precision_multigrid_solvers_for_pdes_tpu.models import problems as P
    from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (
        MultigridConfig,
    )
    from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.refinement import (
        _ir_jit,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1025
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    prob = P.poisson_mms_sinsin(n)
    cfg = MultigridConfig(
        smoother="rbgs", omega=1.0, tol=1e-9, backend="auto", max_iterations=40
    )
    levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float32", cfg=cfg)
    f = prob.rhs(jnp.float64)
    u0 = prob.initial_guess(jnp.float64)
    st_hi = levels[0].stencil.astype(jnp.float64)

    @partial(jax.jit, static_argnames=("cfg",))
    def batch_solve(levels, st_hi, fs, u0, cfg):
        def body(carry, fk):
            u, packed = _ir_jit(levels, st_hi, fk, u0, cfg,
                                inner_cycles=2, max_outer=100, use_fmg=True)
            # stats layout (refinement._ir_jit): [iters, rnorm, rnorm0,
            # fnorm, converged, hist...]
            return carry, packed[:5]
        _, stats = jax.lax.scan(body, 0, fs)
        return stats

    # frequency-swept MMS batch: every solve is a genuinely different system
    # -lap u_i = f_i with u_i = a_i sin(kx_i pi x) sin(ky_i pi y) — distinct
    # spectral content per solve, not scalar multiples of one RHS.
    g = prob.grid
    px, py = g.shape_padded
    X, Y = np.meshgrid(np.arange(n) * g.hx, np.arange(n) * g.hy,
                       indexing="ij")
    FREQS = [(1, 1), (2, 1), (1, 3), (3, 2), (2, 5), (5, 1), (4, 3), (1, 7)]

    def make_batch(r):
        fs = np.zeros((K, px, py), np.float64)
        for i in range(K):
            kx, ky = FREQS[i % len(FREQS)]
            amp = 1.0 + (i + r * K) / (K * 8.0)
            fs[i, :n, :n] = (amp * (kx**2 + ky**2) * np.pi**2
                             * np.sin(kx * np.pi * X)
                             * np.sin(ky * np.pi * Y))
        return jnp.asarray(fs)

    try:
        # warmup / compile
        stats = np.asarray(batch_solve(levels, st_hi, make_batch(0), u0, cfg))
        assert stats.shape == (K, 5) and np.all(stats[:, 4] == 1.0), stats

        # min over repeats: the tunnel's residual per-execution jitter smears
        # a mean; each repeat uses fresh right-hand sides (relay exec cache)
        runs = 5
        dt = float("inf")
        for r in range(1, runs + 1):
            fs = jax.block_until_ready(make_batch(r))
            t0 = time.time()
            stats = batch_solve(levels, st_hi, fs, u0, cfg)
            jax.block_until_ready(stats)
            dt = min(dt, (time.time() - t0) / K)
        stats = np.asarray(stats)
        assert np.all(stats[:, 4] == 1.0), stats
    except Exception as e:  # pragma: no cover - robustness for unattended runs
        # fall back to single-solve timing (includes the full per-execution
        # tunnel cost; understates the framework but never fails the round)
        print(f"# batch bench failed ({type(e).__name__}: {e}); "
              "falling back to single-solve timing", file=sys.stderr)
        from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers import (
            ir_solve,
        )

        u, info = ir_solve(levels, f, u0, cfg, inner_cycles=2, use_fmg=True)
        assert info["converged"], info
        dt = float("inf")
        for r in range(1, 8):
            fr = (1.0 + r / 64.0) * f
            t0 = time.time()
            u, info = ir_solve(levels, fr, u0, cfg, inner_cycles=2,
                               use_fmg=True)
            dt = min(dt, time.time() - t0)
        assert info["converged"], info

    dofs = (n - 2) ** 2
    dof_per_s = dofs / dt
    ref_dof_per_s = 1025**2 / 8.76  # reference A100 fp32 claim
    print(
        json.dumps(
            {
                "metric": "poisson_1025sq_mixed_precision_solve_DoF_per_s",
                "value": round(dof_per_s, 1),
                "unit": "DoF/s",
                "vs_baseline": round(dof_per_s / ref_dof_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
