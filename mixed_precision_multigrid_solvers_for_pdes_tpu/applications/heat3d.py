"""3D heat-equation time stepping — real (the reference's HeatSolver3D was a
memory-estimator stub, reference applications/heat_solver.py:752-792).

Same design as applications/heat.py: implicit steps are shifted-operator
multigrid cycles with the shift folded into the 7-point diagonal, the whole
fixed-dt loop is one ``lax.scan``. Reuses HeatConfig.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid3d import Grid3D
from ..ops import stencil3d as st3
from ..solvers import multigrid3d as mg3
from ..solvers.multigrid import MultigridConfig
from .heat import HeatConfig


@dataclasses.dataclass
class HeatProblem3D:
    name: str
    grid: Grid3D
    alpha: float = 1.0
    u0: Any = None
    q: Optional[Callable] = None       # q(X, Y, Z, t) jnp ops
    exact: Optional[Callable] = None   # exact(X, Y, Z, t) jnp ops
    a: Any = None

    def mesh(self, dtype=jnp.float64):
        X, Y, Z = self.grid.coordinates(padded=True)
        return (jnp.asarray(X, dtype), jnp.asarray(Y, dtype),
                jnp.asarray(Z, dtype))

    def initial_state(self, dtype) -> jnp.ndarray:
        if self.u0 is not None:
            return jnp.asarray(self.u0, dtype)
        if self.exact is not None:
            X, Y, Z = self.mesh(dtype)
            u = self.exact(X, Y, Z, jnp.asarray(0.0, dtype)).astype(dtype)
            return jnp.where(st3.logical_mask3d(self.grid), u, 0.0)
        return jnp.zeros(self.grid.shape_padded, dtype)

    def error_norms(self, u, t: float) -> Dict[str, float]:
        g = self.grid
        X, Y, Z = self.mesh()
        mask = st3.logical_mask3d(g)
        ue = self.exact(X, Y, Z, jnp.asarray(t, jnp.float64))
        diff = jnp.where(mask, u.astype(jnp.float64) - ue, 0.0)
        return {
            "l2": float(jnp.sqrt(g.hx * g.hy * g.hz * jnp.sum(diff * diff))),
            "linf": float(jnp.max(jnp.abs(diff))),
        }


def shift_hierarchy3d(levels, lam):
    import dataclasses as _dc

    out = []
    for lev in levels:
        st = lev.stencil
        lam_t = jnp.asarray(lam, lev.dtype)
        # works for Stencil3D and Stencil27 (Galerkin coarse levels)
        out.append(mg3.Level3D(
            stencil=_dc.replace(st, c=st.c + lam_t),
            grid=lev.grid, dtype=lev.dtype, spec=lev.spec,
        ))
    return tuple(out)


def solve_heat3d(
    problem: HeatProblem3D,
    t_final: float,
    dt: float,
    cfg: HeatConfig = HeatConfig(),
    *,
    mesh=None,
    checkpoint=None,
    checkpoint_every: int = 0,
) -> Dict[str, Any]:
    """Fixed-dt integration under one lax.scan (theta schemes, BDF2 with a
    Crank-Nicolson bootstrap, explicit).

    With ``mesh`` the run is SPMD over the device mesh: (x, y) are
    block-partitioned, z stays on-device (lane axis + line-smoother
    direction), per-level constraints threaded through every V-cycle.

    With ``checkpoint`` (a utils.checkpoint.CheckpointManager) the scan runs
    in chunks of ``checkpoint_every`` steps with atomic (u_prev, u, t) saves
    and resumes bit-exactly from the latest checkpoint (BDF2 two-step
    history preserved) — 3D sibling of solve_heat's checkpoint path.
    checkpoint_every=0 saves once at the end."""
    if cfg.scheme not in ("explicit", "backward_euler", "crank_nicolson",
                          "theta", "bdf2"):
        raise ValueError(
            f"solve_heat3d does not support scheme={cfg.scheme!r}; "
            "use explicit/backward_euler/crank_nicolson/theta/bdf2"
        )
    if cfg.adaptive_dt:
        raise ValueError("solve_heat3d is fixed-dt (adaptive_dt is 2D-only)")
    dtype = jnp.dtype(cfg.dtype)
    grid = problem.grid
    alpha = problem.alpha
    levels0 = mg3.build_hierarchy3d(grid, a=problem.a, lam=0.0,
                                    dtype=dtype, cfg=cfg.mg)
    lev0 = levels0[0]
    constrain = None
    if mesh is not None:
        from ..parallel import distributed as dist_mod
        constrain = dist_mod.make_constrainer3d(mesh)
    unknown = lev0.unknown
    X, Y, Z = problem.mesh(dtype)
    st_sp = lev0.stencil
    fixed = st3.logical_mask3d(grid) & ~unknown

    def source(t):
        if problem.q is None:
            return jnp.zeros(grid.shape_padded, dtype)
        return problem.q(X, Y, Z, t).astype(dtype)

    def install_bc(u, t):
        if problem.exact is None:
            return u
        return jnp.where(fixed, problem.exact(X, Y, Z, t).astype(dtype), u)

    n_steps = max(1, int(round(t_final / dt)))
    dt_val = t_final / n_steps

    def theta_step(th):
        def step(u_prev, u, t, dt_):
            tn1 = t + dt_
            dtc = dt_.astype(dtype)
            lam = 1.0 / (alpha * th * dtc)
            levels = shift_hierarchy3d(levels0, lam)
            F = u * lam + (th * source(tn1) + (1 - th) * source(t)) / (alpha * th)
            if th < 1.0:
                F = F - (1.0 - th) / th * st3.apply(st_sp, u)
            F = jnp.where(unknown, F, jnp.zeros((), dtype))
            u_new = install_bc(u, tn1)
            for _ in range(cfg.cycles_per_step):
                u_new = mg3.mg_cycle3d(levels, u_new, F, cfg.mg,
                                       constrain=constrain)
            return u_new

        return step

    if cfg.scheme == "explicit":
        limit = 1.0 / (2 * alpha * (1 / grid.hx**2 + 1 / grid.hy**2
                                    + 1 / grid.hz**2))
        if dt_val > limit * (1 + 1e-12):
            raise ValueError(f"explicit dt={dt_val:g} exceeds limit {limit:g}")

        def step(u_prev, u, t, dt_):
            lap = -st3.apply(st_sp, u)
            rhs = (alpha * lap + source(t)).astype(dtype)
            u_new = jnp.where(unknown, u + dt_.astype(dtype) * rhs, u)
            u_new = install_bc(u_new, t + dt_)
            return u_new if constrain is None else constrain(u_new, lev0)

    elif cfg.scheme == "bdf2":
        # (3u^{n+1} - 4u^n + u^{n-1})/(2dt) = alpha(-A_sp u^{n+1}) + q^{n+1}
        # (uniform dt; first step bootstrapped by Crank-Nicolson, cf.
        # applications/heat.py)
        def step(u_prev, u, t, dt_):
            tn1 = t + dt_
            dtc = dt_.astype(dtype)
            lam = 3.0 / (2.0 * alpha * dtc)
            levels = shift_hierarchy3d(levels0, lam)
            F = (4.0 * u - u_prev) / (2.0 * alpha * dtc) + source(tn1) / alpha
            F = jnp.where(unknown, F, jnp.zeros((), dtype))
            u_new = install_bc(u, tn1)
            for _ in range(cfg.cycles_per_step):
                u_new = mg3.mg_cycle3d(levels, u_new, F, cfg.mg,
                                       constrain=constrain)
            return u_new

    else:
        step = theta_step(cfg.effective_theta)

    @partial(jax.jit, static_argnames=("n",))
    def run(u_prev0, u0, t0, dt_, n: int):
        def body(carry, _):
            u_prev, u, t = carry
            u_new = step(u_prev, u, t, dt_)
            return (u, u_new, t + dt_), None

        (u_prev, u, t), _ = jax.lax.scan(body, (u_prev0, u0, t0), None,
                                         length=n)
        return u_prev, u, t

    u0 = problem.initial_state(dtype)
    if mesh is not None:
        from ..parallel import mesh as mesh_mod
        u0 = jax.device_put(
            u0, mesh_mod.grid_sharding3d(mesh, grid))
    dt_t = jnp.asarray(dt_val, jnp.float64)
    t0 = jnp.asarray(0.0, jnp.float64)
    u_prev0, start = u0, 0
    resumed = False
    if checkpoint is not None and checkpoint.latest_step() is not None:
        arrays, meta = checkpoint.restore()
        if abs(meta.get("dt", dt_val) - dt_val) > 1e-12 * max(abs(dt_val), 1.0):
            raise ValueError(
                f"checkpoint dt={meta.get('dt')} != requested dt={dt_val}; "
                "resume requires the same step size")
        if meta.get("scheme", cfg.scheme) != cfg.scheme:
            raise ValueError(
                f"checkpoint scheme={meta.get('scheme')!r} != requested "
                f"scheme={cfg.scheme!r}; resuming would continue from "
                "incompatible time-integration history")
        u_prev0 = jnp.asarray(arrays["u_prev"], dtype)
        u0 = jnp.asarray(arrays["u"], dtype)
        if mesh is not None:
            from ..parallel import mesh as mesh_mod
            sh3 = mesh_mod.grid_sharding3d(mesh, grid)
            u_prev0 = jax.device_put(u_prev0, sh3)
            u0 = jax.device_put(u0, sh3)
        start = int(meta["k"])
        t0 = jnp.asarray(meta["t"], jnp.float64)
        resumed = True
    if cfg.scheme == "bdf2" and n_steps >= 1 and not resumed:
        u1 = jax.jit(theta_step(0.5))(u0, u0, t0, dt_t)  # CN bootstrap
        u_prev0, u0 = u0, u1
        t0 = t0 + dt_t
        start = 1
    u_prev, u, t = u_prev0, u0, t0
    if checkpoint is not None:
        every = checkpoint_every if checkpoint_every > 0 else n_steps
        k = start
        while k < n_steps:
            m = min(every, n_steps - k)
            u_prev, u, t = run(u_prev, u, t, dt_t, m)
            k += m
            checkpoint.save(
                k, {"u_prev": u_prev, "u": u},
                {"t": float(t), "k": k, "dt": dt_val, "scheme": cfg.scheme},
            )
        if (checkpoint.latest_step() or 0) < n_steps:
            # n_steps fully covered by the bootstrap (bdf2, n_steps == 1):
            # the loop never ran — still honor the save-at-end contract
            checkpoint.save(
                n_steps, {"u_prev": u_prev, "u": u},
                {"t": float(t), "k": n_steps, "dt": dt_val,
                 "scheme": cfg.scheme},
            )
    elif start < n_steps:
        u_prev, u, t = run(u_prev0, u0, t0, dt_t, n_steps - start)
    out = {"u": u, "t": float(t), "steps": n_steps}
    if problem.exact is not None:
        out["errors"] = problem.error_norms(u, float(t))
    return out


def heat_source3d(n: int, alpha: float = 1.0) -> HeatProblem3D:
    """Steady manufactured source: u = sin(pi x) sin(pi y) sin(pi z)
    (time-independent), q = 3 pi^2 alpha u — the 3D analogue of the 2D
    heat_source problem (applications/heat_problems.py:34)."""
    PI = np.pi

    def spatial(X, Y, Z):
        return jnp.sin(PI * X) * jnp.sin(PI * Y) * jnp.sin(PI * Z)

    def exact(X, Y, Z, t):
        return spatial(X, Y, Z) + 0.0 * t

    def q(X, Y, Z, t):
        return 3 * PI**2 * alpha * spatial(X, Y, Z)

    return HeatProblem3D("heat3d_source", Grid3D(n, n, n), alpha=alpha,
                         exact=exact, q=q)


def oscillating3d(n: int, alpha: float = 1.0,
                  omega: float = 2 * np.pi) -> HeatProblem3D:
    """u = sin(pi x) sin(pi y) sin(pi z) cos(omega t);
    q = u_t - alpha lap u = (-omega sin(omega t) + 3 pi^2 alpha cos(omega t))
    * spatial — time-dependent source (3D analogue of the 2D oscillating
    problem, applications/heat_problems.py:90)."""
    PI = np.pi

    def spatial(X, Y, Z):
        return jnp.sin(PI * X) * jnp.sin(PI * Y) * jnp.sin(PI * Z)

    def exact(X, Y, Z, t):
        return spatial(X, Y, Z) * jnp.cos(omega * t)

    def q(X, Y, Z, t):
        return spatial(X, Y, Z) * (-omega * jnp.sin(omega * t)
                                   + 3 * PI**2 * alpha * jnp.cos(omega * t))

    return HeatProblem3D("heat3d_oscillating", Grid3D(n, n, n), alpha=alpha,
                         exact=exact, q=q)


def pure_diffusion3d(n: int, alpha: float = 1.0) -> HeatProblem3D:
    """u = sin(pi x) sin(pi y) sin(pi z) e^{-3 pi^2 alpha t}, q = 0."""
    PI = np.pi

    def exact(X, Y, Z, t):
        return (jnp.sin(PI * X) * jnp.sin(PI * Y) * jnp.sin(PI * Z)
                * jnp.exp(-3 * PI**2 * alpha * t))

    return HeatProblem3D("heat3d_pure_diffusion", Grid3D(n, n, n),
                         alpha=alpha, exact=exact)
