"""Command-line driver: per-system solve + closed-loop simulation.

Reference analogue: the per-example ``main()`` binaries with getopt flags
(``c3sc/examples/<system>/*.c`` — line n/a, empty mount; SURVEY.md §2.1 —
flags: verbosity, grid size, cross tolerance, rank caps, output dir, "use
saved cost" toggles). One registry CLI covers all five systems:

    python -m c3sc_tpu.cli pendulum --n 41 --solver tt --rmax 16 \
        --rollouts 256 --steps 700 --outdir /tmp/pendulum

Writes: value function (vf.npz), solver metrics (metrics.jsonl), rollout
trajectories (traj.npz), and optional value-slice/trajectory plots.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="c3sc_tpu", description=__doc__)
    p.add_argument("system", choices=["lq", "pendulum", "dubins", "glider", "quadcopter", "quadcopter7"])
    p.add_argument("--n", type=int, default=41, help="grid nodes per dim")
    p.add_argument("--solver", choices=["dense", "tt", "pi", "fused"],
                   default="fused")
    p.add_argument("--n-controls", type=int, default=9, help="candidates per control dim")
    p.add_argument("--rmax", type=int, default=16, help="TT rank cap")
    p.add_argument("--rmax-max", type=int, default=None,
                   help="fused solver: grow the rank cap up to this on a "
                        "saturated stall (C3 kick-rank semantics)")
    p.add_argument("--tol", type=float, default=1e-4, help="VI residual tolerance")
    p.add_argument("--cross-tol", type=float, default=1e-4)
    p.add_argument("--cross-method", choices=["cross", "dmrg"], default="cross",
                   help="tt solver: single-site kick-rank cross or two-site DMRG")
    p.add_argument("--max-iters", type=int, default=1000)
    p.add_argument("--rollouts", type=int, default=0, help="closed-loop rollout count")
    p.add_argument("--steps", type=int, default=500, help="rollout steps")
    p.add_argument("--dt", type=float, default=0.01, help="simulation step")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--outdir", type=str, default=None)
    p.add_argument("--load", type=str, default=None, help="load saved value fn / checkpoint")
    p.add_argument("--save-every", type=int, default=100, help="checkpoint cadence")
    p.add_argument("--save-format", choices=["npz", "c3tt"], default="npz",
                   help="value-function format: npz (padded cores) or the "
                        "compact active-rank c3tt binary (native/ "
                        "serializer, C3 function_train_save parity)")
    p.add_argument("--policy-basis", choices=["linelm", "poly"],
                   default="linelm",
                   help="rollout policy value basis: grid linelm (default)"
                        " or an orthonormal-polynomial FT re-expansion "
                        "(C3 polynomials.c class; ops/ft.py)")
    p.add_argument("--probe", type=int, default=0,
                   help="fused solver: closed-loop probe rollouts for best-iterate harvesting")
    p.add_argument("--plot", action="store_true", help="write value/trajectory plots")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("-v", "--verbose", action="count", default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from c3sc_tpu.models import make_problem
    from c3sc_tpu.utils import MetricsLogger
    from c3sc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    outdir = args.outdir or f"./out_{args.system}"
    os.makedirs(outdir, exist_ok=True)
    metrics = MetricsLogger(os.path.join(outdir, "metrics.jsonl"),
                            echo=args.verbose >= 2)

    prob = make_problem(args.system)
    grid = prob.default_grid(args.n)
    controls = prob.control_candidates(args.n_controls)
    key = jax.random.key(args.seed)
    t0 = time.time()

    if args.solver == "dense":
        from c3sc_tpu.ops.interp import multilinear_interp
        from c3sc_tpu.solvers import dense_vi

        if prob.dx > 3:
            raise SystemExit("dense solver supports dx <= 3; use --solver tt")
        sol = dense_vi(prob, grid, controls=controls, tol=args.tol,
                       verbose=args.verbose >= 1)
        np.savez(os.path.join(outdir, "vf.npz"), v=np.asarray(sol.v))
        value_fn = lambda pts: multilinear_interp(grid, sol.v, pts)
        summary = dict(solver="dense", residual=float(sol.residual), sweeps=sol.sweeps)
    else:
        from c3sc_tpu.ops.tt import tt_lerp_eval

        ckpt = os.path.join(outdir, "vf.npz")
        common = dict(
            controls=controls, rmax=args.rmax, key=key, tol=args.tol,
            cross_tol=args.cross_tol, verbose=args.verbose >= 1, metrics=metrics,
        )
        if args.solver == "fused":
            from c3sc_tpu.solvers.fused import fused_tt_vi
            from c3sc_tpu.utils import save_solver_state

            fkw = dict(common)
            for drop in ("cross_tol", "verbose"):
                fkw.pop(drop, None)
            # --load accepts either a full fused checkpoint
            # (solver_state.npz -> resume mid-VI) or a plain value file
            # (vf.npz -> warm-start v0)
            resume_from, v0 = None, None
            if args.load:
                from c3sc_tpu.utils.checkpoint import is_fused_checkpoint

                if args.load.endswith(".c3tt"):
                    from c3sc_tpu.native import tt_from_active, tt_load_binary

                    v0 = tt_from_active(tt_load_binary(args.load),
                                        rmax=args.rmax)
                elif is_fused_checkpoint(args.load):
                    resume_from = args.load
                else:
                    from c3sc_tpu.utils import load_solver_state

                    v0 = load_solver_state(args.load)["v"]
            sol = fused_tt_vi(prob, grid, max_iters=args.max_iters,
                              rmax_max=args.rmax_max,
                              probe_rollouts=args.probe, probe_dt=args.dt,
                              checkpoint_path=os.path.join(outdir, "solver_state.npz"),
                              checkpoint_every=args.save_every,
                              resume_from=resume_from, v0=v0,
                              **fkw)
            save_solver_state(ckpt, sol.v, None, sol.iterations)
            summary = dict(solver="fused", residual=float(sol.residual),
                           iterations=sol.iterations,
                           ranks=[int(r) for r in np.asarray(sol.v.ranks)],
                           wall=round(sol.wall_time, 2))
        elif args.solver == "tt":
            from c3sc_tpu.solvers.ttvi import tt_vi

            sol = tt_vi(prob, grid, max_iters=args.max_iters,
                        checkpoint_path=ckpt, checkpoint_every=args.save_every,
                        resume_from=args.load, cross_method=args.cross_method,
                        **common)
            summary = dict(solver="tt", residual=float(sol.residual),
                           iterations=sol.iterations, evals=sol.n_evals,
                           ranks=sol.ranks[-1], wall=round(sol.wall_time, 2))
        else:
            from c3sc_tpu.solvers.ttpi import tt_pi

            sol = tt_pi(prob, grid, outer_iters=args.max_iters, **common)
            from c3sc_tpu.utils import save_solver_state

            save_solver_state(ckpt, sol.v, None, sol.outer_iters)
            summary = dict(solver="pi", residual=float(sol.residual),
                           outer_iters=sol.outer_iters, evals=sol.n_evals,
                           wall=round(sol.wall_time, 2))
        if args.save_format == "c3tt":
            from c3sc_tpu.native import have_native, tt_save_binary, tt_to_active

            tt_path = os.path.join(outdir, "vf.c3tt")
            tt_save_binary(tt_path, tt_to_active(sol.v))
            summary["c3tt_file"] = tt_path
            summary["c3tt_native"] = have_native()
        if args.policy_basis == "poly":
            from c3sc_tpu.ops.ft import ft_eval, ft_from_tt

            ft = ft_from_tt(sol.v, grid)
            value_fn = lambda pts: ft_eval(ft, pts)
        else:
            value_fn = lambda pts: tt_lerp_eval(sol.v, grid, pts)

    summary["solve_wall_s"] = round(time.time() - t0, 2)

    if args.rollouts > 0:
        from c3sc_tpu.sim import make_implicit_policy, rollout

        policy = make_implicit_policy(prob, grid, value_fn, controls)
        rng = np.random.default_rng(args.seed)
        lb, ub = np.asarray(prob.lb), np.asarray(prob.ub)
        mid, span = (lb + ub) / 2, (ub - lb) / 2
        x0 = jnp.asarray(mid + 0.5 * span * rng.uniform(-1, 1, (args.rollouts, prob.dx)))
        t1 = time.time()
        traj = jax.jit(
            lambda x0, k: rollout(prob, grid, policy, x0, k, args.dt, args.steps)
        )(x0, jax.random.key(args.seed + 1))
        jax.block_until_ready(traj)
        np.savez(
            os.path.join(outdir, "traj.npz"),
            xs=np.asarray(traj.xs), us=np.asarray(traj.us),
            cost=np.asarray(traj.cost), exit_time=np.asarray(traj.exit_time),
        )
        summary.update(
            rollouts=args.rollouts,
            mean_cost=float(np.asarray(traj.cost).mean()),
            rollout_wall_s=round(time.time() - t1, 2),
        )

    if args.plot:
        _plot(outdir, prob, grid, value_fn, args)

    metrics.log("summary", **summary)
    metrics.close()
    print(json.dumps({"system": args.system, **summary}))
    return summary


def _plot(outdir, prob, grid, value_fn, args):
    """Value-slice heatmap + trajectory overlay (reference: per-example
    Python matplotlib scripts, SURVEY.md §2.1)."""
    import matplotlib

    matplotlib.use("Agg")
    import jax.numpy as jnp
    import matplotlib.pyplot as plt
    import numpy as np

    n0, n1 = grid.shape[0], grid.shape[1]
    a = np.asarray(grid.nodes(0))
    b = np.asarray(grid.nodes(1))
    A, Bm = np.meshgrid(a, b, indexing="ij")
    mid = [(lo + hi) / 2 for lo, hi in zip(prob.lb, prob.ub)]
    pts = np.tile(np.asarray(mid), (n0 * n1, 1))
    pts[:, 0] = A.ravel()
    pts[:, 1] = Bm.ravel()
    v = np.asarray(value_fn(jnp.asarray(pts, jnp.float32))).reshape(n0, n1)
    fig, ax = plt.subplots(figsize=(6, 5))
    pc = ax.pcolormesh(A, Bm, v, shading="auto")
    fig.colorbar(pc, ax=ax, label="value")
    ax.set_xlabel("x0")
    ax.set_ylabel("x1")
    ax.set_title(f"{prob.name}: value slice (dims 0,1)")
    tpath = os.path.join(outdir, "traj.npz")
    if os.path.exists(tpath):
        data = np.load(tpath)
        xs = data["xs"]
        for btraj in range(min(16, xs.shape[1])):
            ax.plot(xs[:, btraj, 0], xs[:, btraj, 1], lw=0.7, alpha=0.7, c="w")
    fig.savefig(os.path.join(outdir, "value.png"), dpi=120)
    plt.close(fig)


if __name__ == "__main__":
    main()
