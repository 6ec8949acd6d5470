"""One-off: merge solve_microbench log rows from the two round-5 S1 runs
(129-1025 at k 16/64 + 2049 at k 8/32, same session family) into
reports/solve_throughput.{json,md}."""

import json
import re
import sys
from pathlib import Path

rows = []
for path, (k_lo, k_hi) in zip(sys.argv[1:], ((16, 64), (8, 32))):
    for line in Path(path).read_text().splitlines():
        m = re.match(r"\s*(\d+) (fp32|mixed)\s+(auto|xla)\s+([\d.]+) "
                     r"ms/solve\s+([\d.]+) MDoF/s\s+\(iters=(\d+)\)", line)
        if m:
            n, prec, backend, ms, mdof, it = m.groups()
            rows.append({
                "n": int(n), "backend": backend, "precision": prec,
                "k_lo": k_lo, "k_hi": k_hi,
                "per_solve_ms": float(ms), "mdof_per_s": float(mdof),
                "iterations": int(it),
            })

speedups = {}
by = {(r["n"], r["precision"], r["backend"]): r for r in rows}
for (n, prec, backend), r in by.items():
    if backend == "auto" and (n, prec, "xla") in by:
        speedups[f"{n}/{prec}"] = (by[(n, prec, "xla")]["per_solve_ms"]
                                   / r["per_solve_ms"])

out = Path("reports")
out.mkdir(exist_ok=True)
(out / "solve_throughput.json").write_text(json.dumps({
    "rows": rows, "backend_speedups_batched": speedups,
    "protocol": "two-K marginal, chained whole solves in one session "
    "(fp32: uniform fp32 IR hierarchy; mixed: bf16-coarse policy ladder; "
    "both: f64 outer + FMG, tol 1e-9 relative, 3e-8 at 2049^2 = the "
    "fp32-correction floor)",
}, indent=2))
md = ["# Marginal solve throughput (tunnel-free, two-K protocol)", "",
      "Per-solve cost of the full production solve when solves are chained "
      "inside one dispatch. Same-session backend A/B — the decision-grade "
      "reconciliation of round-4's per-solve-dispatch 0.49x artifact "
      "(VERDICT r4 next-round #1). Reference A100 fp32: 0.12 MDoF/s "
      "(docs/results.md:271).", "",
      "| n | precision | backend | ms/solve | MDoF/s | iters |",
      "|---|---|---|---|---|---|"]
for r in rows:
    md.append(f"| {r['n']} | {r['precision']} | {r['backend']} | "
              f"{r['per_solve_ms']:.3f} | {r['mdof_per_s']:.1f} | "
              f"{r['iterations']} |")
md += ["", "## Solve-level backend speedups (t_xla / t_auto, same session, "
       "batched)", "", "| size/precision | speedup |", "|---|---|"]
for cell, sp in sorted(speedups.items(), key=lambda kv: kv[0]):
    md.append(f"| {cell} | {sp:.2f}x |")
(out / "solve_throughput.md").write_text("\n".join(md))
print(f"wrote {len(rows)} rows, speedups: "
      + json.dumps({k: round(v, 2) for k, v in sorted(speedups.items())}))
