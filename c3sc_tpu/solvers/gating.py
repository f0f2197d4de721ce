"""Measured accept/reject gating for value-correction stages.

VERDICT r4 weak #2: ``mode_correct`` shipped ungated and degraded the
round-4 flagship artifact (value q95 6.16% -> 6.42%, greedy 1.54% ->
4.08%). Rule adopted here (r4 verdict next #2): NO correction stage
touches the deliverable unless measurement says it did not regress —
the sampled sup Bellman defect AND (optionally) a small common-random-
number closed-loop probe cost.

The defect gate is one-sided with slack: corrections that target
defect-INVISIBLE smooth error (level/mode/two-grid) legitimately leave
the defect unchanged — they only must not make it materially worse. The
probe gate catches the opposite failure: a correction that helps the
defect but worsens the deployed policy.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops.tt import tt_gather_eval
from c3sc_tpu.solvers.ttvi import make_bellman_kernel


@dataclasses.dataclass
class GateRecord:
    name: str
    accepted: bool
    bres_before: float
    bres_after: float
    probe_before: float | None
    probe_after: float | None


def make_greedy_probe(problem: ControlProblem, grid: Grid, controls,
                      n_rollouts: int = 24, n_steps: int = 250,
                      dt: float = 0.01, seed: int = 4242,
                      value_fn_of=None):
    """CRN closed-loop probe: mean discounted greedy-rollout cost of a
    value iterate, fixed initial states + noise key (comparable across
    calls). ``value_fn_of(v) -> (p [B,d]) -> [B]`` overrides the plain
    TT lerp (e.g. the composite TT+patch field)."""
    from c3sc_tpu.ops.tt import tt_lerp_eval
    from c3sc_tpu.sim.integrators import rollout as _rollout
    from c3sc_tpu.sim.policy import make_implicit_policy

    rng = np.random.default_rng(seed)
    lbn, ubn = np.asarray(problem.lb), np.asarray(problem.ub)
    mid, span = (lbn + ubn) / 2, (ubn - lbn) / 2
    x0 = jnp.asarray(mid + 0.4 * span * rng.uniform(
        -1, 1, (n_rollouts, problem.dx)), jnp.float32)
    key = jax.random.key(20_000 + seed)
    uc = jnp.asarray(controls, jnp.float32)

    if value_fn_of is None:
        value_fn_of = lambda v: (lambda p: tt_lerp_eval(v, grid, p))

    @jax.jit
    def _cost(v):
        pol = make_implicit_policy(problem, grid, value_fn_of(v), uc)
        tr = _rollout(problem, grid, pol, x0, key, dt, n_steps)
        return jnp.mean(tr.cost)

    return lambda v: float(_cost(v))


def gated_apply(
    problem: ControlProblem,
    grid: Grid,
    controls,
    v,
    stage_fn: Callable,
    name: str = "stage",
    kernel=None,
    n_check: int = 4096,
    seed: int = 23,
    bres_slack: float = 1.05,
    probe_fn=None,
    probe_slack: float = 1.02,
    verbose: bool = False,
):
    """Apply ``stage_fn(v) -> v_new`` and keep the result ONLY if the
    sampled sup-defect and (when given) the CRN probe cost do not
    regress beyond their slacks. Returns (v_out, GateRecord)."""
    if kernel is None:
        kernel = make_bellman_kernel(
            problem, grid, jnp.asarray(controls, jnp.float32), chunk=32768)
    rng = np.random.default_rng(seed)
    check = jnp.asarray(np.stack([rng.integers(0, n, n_check)
                                  for n in grid.shape], -1), jnp.int32)

    def _bres(vt):
        tv = np.asarray(kernel(vt, check))
        vv = np.asarray(tt_gather_eval(vt, check))
        return float(np.max(np.abs(tv - vv)))

    b0 = _bres(v)
    p0 = probe_fn(v) if probe_fn is not None else None
    v_new = stage_fn(v)
    b1 = _bres(v_new)
    p1 = probe_fn(v_new) if probe_fn is not None else None
    ok = b1 <= bres_slack * b0
    if probe_fn is not None:
        ok = ok and (p1 <= probe_slack * max(p0, 1e-12))
    rec = GateRecord(name=name, accepted=bool(ok), bres_before=b0,
                     bres_after=b1, probe_before=p0, probe_after=p1)
    if verbose:
        pr = "" if p0 is None else f" probe {p0:.4f}->{p1:.4f}"
        print(f"[gate:{name}] bres {b0:.4f}->{b1:.4f}{pr} "
              f"accepted={ok}", flush=True)
    return (v_new if ok else v), rec


def probe_trim(
    problem: ControlProblem,
    grid: Grid,
    controls,
    v,
    probe_fn=None,
    dims=None,
    deltas=(-0.04, -0.02, 0.0, 0.02, 0.04),
    rounds: int = 2,
    verbose: bool = False,
):
    """Oracle-free closed-loop TRIM of the slowest field modes.

    Coordinate search over {level} + {per-dim centered ramps} coefficients
    scored by the CRN greedy-probe cost — integral-action bias trim
    against the production system's own realized cost. Motivation
    (round 5, 9^6 quad): the deployment cost gap is a PARKING OFFSET
    (tail z 0.29 vs oracle 0.21, experiments/park_diag.py) driven by
    basin-scale value tilt that no defect- or residual-based objective
    can see; the realized probe cost sees it directly. Out-of-sample
    honesty: the probe keys are disjoint from the evaluation keys.

    ``deltas`` are fractions of the value RANGE. Returns (v, history).
    """
    from c3sc_tpu.ops.tt import tt_constant, tt_rank1
    from c3sc_tpu.solvers.twogrid import _blend   # jitted v + a*m + round

    if probe_fn is None:
        probe_fn = make_greedy_probe(problem, grid, controls)
    if dims is None:
        dims = list(range(problem.dx))
    shape = tuple(grid.shape)
    R = v.rmax
    # value range estimate for delta scaling
    rng = np.random.default_rng(5)
    pts = jnp.asarray(np.stack([rng.integers(0, n, 2048)
                                for n in shape], -1), jnp.int32)
    vals = np.asarray(tt_gather_eval(v, pts))
    vrange = max(float(vals.max() - vals.min()), 1e-9)

    modes = [("level", tt_constant(shape, 1.0, R))]
    for k in dims:
        nk = np.asarray(grid.nodes(k), np.float32)
        ramp = (nk - nk.mean()) / max(nk.max() - nk.min(), 1e-9)
        factors = [jnp.asarray(ramp) if j == k
                   else jnp.ones(shape[j], jnp.float32)
                   for j in range(problem.dx)]
        modes.append((f"ramp{k}", tt_rank1(factors, R)))

    best_cost = probe_fn(v)
    history = [{"stage": "init", "probe": best_cost}]
    for rd in range(rounds):
        improved = False
        for name, m in modes:
            cand_best = (0.0, v, best_cost)
            for dl in deltas:
                if dl == 0.0:
                    continue
                v_try = _blend(v, m, jnp.asarray(dl * vrange, jnp.float32))
                c = probe_fn(v_try)
                if c < cand_best[2]:
                    cand_best = (dl, v_try, c)
            if cand_best[0] != 0.0:
                v, best_cost = cand_best[1], cand_best[2]
                improved = True
                history.append({"stage": f"r{rd}:{name}",
                                "delta": cand_best[0], "probe": best_cost})
                if verbose:
                    print(f"[trim] {name} delta={cand_best[0]:+0.3f} "
                          f"probe -> {best_cost:.4f}", flush=True)
        if not improved:
            break
    return v, history
