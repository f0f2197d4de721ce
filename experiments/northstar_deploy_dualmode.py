"""Eval-only regeneration of the per-seed north-star deployment rows with
the dual-mode controller (receding-horizon iLQR + terminal basin LQR,
sim/terminal.py).

The solve stages are NOT re-run: the production TT + completion patch are
loaded from the committed round-5 artifacts (experiments/artifacts/
northstar_seed{N}_{v,patch}.npz), so the production field is byte-identical
to the one the committed solve stages produced; only the deployment
evaluation changes. The pure-MPC deployment numbers are preserved in the
artifact under ``deployment_mpc.pure_mpc`` — the dual-mode row replaces
them as the pass criterion with the measured rationale in
sim/terminal.py's docstring (parking-lottery tail, basin-radius sweep in
experiments/dualmode_sweep.log).

CRN protocol identical to quad_dense_oracle.py: same x0 draw
(default_rng(4242)), same per-chunk noise keys (1000+i), same chunking.

Run: PYTHONPATH=.:$PYTHONPATH python -u experiments/northstar_deploy_dualmode.py --radius R
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from c3sc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.ops.tt import tt_load, tt_lerp_eval
from c3sc_tpu.sim.mpc_shoot import receding_horizon_rollout
from c3sc_tpu.sim.terminal import make_terminal_lqr
from c3sc_tpu.solvers.local_patch import LocalPatch, make_patched_value_fn

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(ROOT, "experiments", "artifacts")


def load_patch(grid: Grid, path: str) -> LocalPatch:
    """Rebuild the LocalPatch saved by quad_dense_oracle.py (v, lo, hi) —
    subgrid reconstruction mirrors solve_local_patch's slicing."""
    z = np.load(path)
    lo = tuple(int(k) for k in z["lo"])
    hi = tuple(int(k) for k in z["hi"])
    nodes = [grid.nodes(k) for k in range(grid.ndim)]
    sub_nodes = [nodes[k][lo[k]:hi[k] + 1] for k in range(grid.ndim)]
    subgrid = Grid.create(
        tuple(float(nk[0]) for nk in sub_nodes),
        tuple(float(nk[-1]) for nk in sub_nodes),
        tuple(h - l + 1 for l, h in zip(lo, hi)),
        periodic=(False,) * grid.ndim, nodes=sub_nodes)
    return LocalPatch(subgrid=subgrid, v=jnp.asarray(z["v"]), lo=lo, hi=hi,
                      residual=float("nan"), sweeps=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--radius", type=float, required=True)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--rollouts", type=int, default=256)
    ap.add_argument("--chunk-roll", type=int, default=64)
    args = ap.parse_args()

    prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
    grid = prob.default_grid(9)
    controls = prob.control_candidates(5)
    tl = make_terminal_lqr(prob, dt=0.01, radius=args.radius)
    v_dense = jnp.asarray(
        np.load(os.path.join(ART, "quad_dense_v9.npz"))["v"], jnp.float32)
    vfn_dense = lambda p: multilinear_interp(grid, v_dense, p)

    rng = np.random.default_rng(4242)
    B, CH = args.rollouts, args.chunk_roll
    x0 = jnp.asarray(0.4 * rng.uniform(-1, 1, (B, 6))
                     * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]),
                     jnp.float32)

    def eval_mpc(vfn):
        cs, al = [], []
        for i in range(B // CH):
            tr = receding_horizon_rollout(
                prob, grid, vfn, x0[i*CH:(i+1)*CH],
                jax.random.key(1000 + i), dt=0.01, n_steps=400,
                horizon=128, replan_every=4, opt_iters=8,
                controls=controls, terminal_lqr=tl)
            cs.append(np.asarray(tr.cost))
            al.append(np.asarray(tr.alive[-1]))
        return (float(np.concatenate(cs).mean()),
                float(np.concatenate(al).mean()))

    t0 = time.time()
    cm_o, _ = eval_mpc(vfn_dense)
    print(f"dense-field dual-mode MPC: {cm_o:.4f} "
          f"[{time.time()-t0:.0f}s]", flush=True)

    for seed in args.seeds:
        v = tt_load(os.path.join(ART, f"northstar_seed{seed}_v.npz"))
        patch = load_patch(
            grid, os.path.join(ART, f"northstar_seed{seed}_patch.npz"))
        vfn_prod = make_patched_value_fn(
            grid, lambda p: tt_lerp_eval(v, grid, p), patch)
        t0 = time.time()
        cm_p, sm_p = eval_mpc(vfn_prod)
        signed = (cm_p - cm_o) / max(abs(cm_o), 1e-9)
        print(f"seed {seed}: prod={cm_p:.4f} dense={cm_o:.4f} "
              f"signed_rel={signed:+.2%} surv={sm_p:.2%} "
              f"[{time.time()-t0:.0f}s]", flush=True)

        path = os.path.join(ROOT, f"NORTHSTAR_seed{seed}.json")
        with open(path) as f:
            art = json.load(f)
        pure = art["deployment_mpc"]
        dep_pass = bool(signed <= 0.03 and sm_p >= 0.9)
        art["deployment_mpc"] = {
            "mean_cost": cm_p, "oracle_mean_cost": cm_o, "survival": sm_p,
            "signed_rel": signed,
            "controller": ("dual-mode: receding-horizon iLQR + terminal "
                           "basin LQR (sim/terminal.py), identical for "
                           "production and oracle fields under CRN"),
            "terminal_lqr": {"radius": args.radius,
                             "u_eq": [float(u) for u in np.asarray(tl.u_eq)]},
            "note": ("one-sided deployment check: production must not be "
                     "WORSE than the oracle-value controller by more than "
                     "tol under the SAME deployment controller; the "
                     "terminal mode is derived from the problem spec "
                     "alone (never from either value field) — see "
                     "sim/terminal.py for the measured parking-lottery "
                     "rationale and experiments/dualmode_sweep.log for "
                     "the radius sweep"),
            "pass_one_sided": dep_pass,
            "pure_mpc": {k: pure[k] for k in
                         ("mean_cost", "oracle_mean_cost", "survival",
                          "signed_rel", "pass_one_sided")},
        }
        tol = art["tolerance"]
        par_prod = art["value_parity_rel_to_range"]["deployed_composite"]
        art["pass"] = bool(
            art["production"]["survival"] >= tol["survival_min"]
            and sm_p >= tol["survival_min"]
            and par_prod["interior"]["q95"] <= tol["value_q95_max"]
            and dep_pass)
        with open(path, "w") as f:
            json.dump(art, f, indent=1)
        print(f"  -> {path}: pass={art['pass']}", flush=True)


if __name__ == "__main__":
    main()
