"""Worker for the REAL multi-process launch test (test_multihost.py).

Each process owns 4 virtual CPU devices; two coordinated processes form the
8-device global mesh and run a sharded Poisson solve end-to-end. This
exercises jax.distributed bring-up, cross-process mesh construction, the
no-global-array data path (make_sharded_field), and cross-process
collectives — the full multi-host recipe that transfers unchanged to TPU
slices (parallel/multihost.py).

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # beat the axon sitecustomize

from mixed_precision_multigrid_solvers_for_pdes_tpu.parallel import (  # noqa: E402
    multihost,
)

multihost.initialize_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import mixed_precision_multigrid_solvers_for_pdes_tpu as mg  # noqa: E402
from mixed_precision_multigrid_solvers_for_pdes_tpu.models import (  # noqa: E402
    problems as P,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.parallel import (  # noqa: E402
    distributed,
)
from mixed_precision_multigrid_solvers_for_pdes_tpu.solvers.multigrid import (  # noqa: E402
    MultigridConfig,
)

info = multihost.process_summary()
assert info["process_count"] == nproc, info
assert info["global_devices"] == 4 * nproc, info

prob = P.poisson_mms_sinsin(65)
mesh = multihost.make_global_mesh(shape=(2, 4), grid=prob.grid)
cfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-10,
                      backend="xla", max_iterations=30)
levels = mg.build_hierarchy(prob.grid, prob.spec, dtype="float64", cfg=cfg)

# no process ever materializes the global RHS: evaluate f = 2 pi^2 sin sin
# per addressable shard on its own coordinate block
f = multihost.make_sharded_field(
    mesh, prob.grid,
    lambda X, Y: 2 * np.pi**2 * np.sin(np.pi * X) * np.sin(np.pi * Y))

u, solve_info = distributed.sharded_solve(mesh, levels, f, cfg=cfg)

# every process checks convergence; process 0 prints the verdict line
assert solve_info["converged"], solve_info
if jax.process_index() == 0:
    print(f"MULTIHOST_OK iters={solve_info['iterations']} "
          f"rho={solve_info['convergence_factor']:.4f}", flush=True)

# the explicit-distribution path (whole solve in one shard_map region with
# ppermute halos) across the SAME two-process mesh — certifies both
# distribution paths under a real multi-process launch (VERDICT r2 #9)
from mixed_precision_multigrid_solvers_for_pdes_tpu.parallel import (  # noqa: E402
    halo_solve as hs,
)

hcfg = MultigridConfig(smoother="rbgs", omega=1.0, tol=1e-8,
                       backend="xla", max_iterations=30)
u_h, info_h = hs.halo_solve(mesh, levels, f, cfg=hcfg)
assert info_h["converged"], info_h
u_ref2, info_ref2 = distributed.sharded_solve(mesh, levels, f, cfg=hcfg)
assert info_h["iterations"] == info_ref2["iterations"], (info_h, info_ref2)
diff = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(u_h, u_ref2))
assert diff < 1e-11, diff
if jax.process_index() == 0:
    print(f"MULTIHOST_HALO_OK iters={info_h['iterations']} diff={diff:.2e}",
          flush=True)
