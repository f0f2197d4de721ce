"""Dual-mode deployment: basin-radius sweep on the saved seed-0 field.

Measures signed_rel (prod-MPC vs dense-MPC, CRN) as a function of the
terminal-LQR basin radius, radius=0 being the round-5 pure-MPC baseline
(+12.5% on seed 0 at the artifact config). See sim/terminal.py docstring.

Run: PYTHONPATH=. python -u experiments/dualmode_sweep.py
"""
import time

import jax
import jax.numpy as jnp
from c3sc_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.ops.tt import tt_load, tt_lerp_eval
from c3sc_tpu.sim.mpc_shoot import receding_horizon_rollout
from c3sc_tpu.sim.terminal import make_terminal_lqr
from c3sc_tpu.solvers.local_patch import make_patched_value_fn
from experiments.northstar_deploy_dualmode import load_patch

prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
grid = prob.default_grid(9)
controls = prob.control_candidates(5)
vd = np.load('experiments/artifacts/quad_dense_v9.npz')['v'].astype(np.float32)
v = tt_load('experiments/artifacts/northstar_seed0_v.npz')
# the SAVED completion patch (the committed artifact's production field)
patch = load_patch(grid, 'experiments/artifacts/northstar_seed0_patch.npz')
vfn_p = make_patched_value_fn(grid, lambda p: tt_lerp_eval(v, grid, p), patch)
vfn_d = lambda p: multilinear_interp(grid, jnp.asarray(vd), p)

tl = make_terminal_lqr(prob, dt=0.01)
print("u_eq =", np.asarray(tl.u_eq), " (hover=2.4525)")
print("K row maxes:", np.abs(np.asarray(tl.K)).max(axis=1))

rng = np.random.default_rng(4242)
B, CH = 256, 64
x0 = jnp.asarray(0.4 * rng.uniform(-1, 1, (B, 6))
                 * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]), jnp.float32)


def eval_mpc(vfn, tlqr):
    cs, al = [], []
    for i in range(B // CH):
        tr = receding_horizon_rollout(
            prob, grid, vfn, x0[i*CH:(i+1)*CH], jax.random.key(1000 + i),
            dt=0.01, n_steps=400, horizon=128, replan_every=4, opt_iters=8,
            controls=controls, terminal_lqr=tlqr)
        cs.append(np.asarray(tr.cost))
        al.append(np.asarray(tr.alive[-1]))
    return float(np.concatenate(cs).mean()), float(np.concatenate(al).mean())


# radius 0.0 (pure MPC) is the committed artifact baseline: +12.5% at
# this exact CRN config (NORTHSTAR_seed0.json deployment_mpc).
# UNLATCHED history (momentary membership test, kept for the record):
#   radius=0.40: prod=1.1090 dense=0.7735 signed_rel=+43.38%  wall=506s
#   radius=0.60: prod=1.1555 dense=0.6854 signed_rel=+68.59%  wall=446s
# -> absolute costs collapse for BOTH fields (the LQR parks far better
#    than either MPC), but prod's tilted field fights the LQR at the
#    basin shell (limit cycle riding the boundary at high state cost).
#    The latched dual-mode (commit on first entry) removes the fight.
for radius in [0.4, 0.25]:
    tlqr = None if radius == 0.0 else tl._replace(radius=radius)
    t0 = time.time()
    cd, _ = eval_mpc(vfn_d, tlqr)
    cp, sp = eval_mpc(vfn_p, tlqr)
    rel = (cp - cd) / cd
    print(f"radius={radius:4.2f}: prod={cp:.4f} dense={cd:.4f} "
          f"signed_rel={rel:+.2%} surv={sp:.2%} "
          f"wall={time.time()-t0:.0f}s", flush=True)
