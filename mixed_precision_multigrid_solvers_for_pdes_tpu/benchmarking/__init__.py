"""Honest benchmarking: solver suites, per-stage profiling, reports.

Counterpart of BOTH reference benchmark layers — the real one
(reference gpu/gpu_benchmark.py:43, benchmarking/performance_profiler.py:41)
and the simulated one (reference benchmarks/performance_benchmark.py:100-156,
which synthesized data from np.random). This package only measures.
"""

from .suite import BenchmarkSuite  # noqa: F401
from .profiler import MultigridProfiler  # noqa: F401
