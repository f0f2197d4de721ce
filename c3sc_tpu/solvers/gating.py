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
