"""Benchmark: Bellman backups/s/chip on the flagship 6D quadcopter config.

North-star metric (BASELINE.json): backups/s per chip >= 10x a single-core C
reference. No published reference numbers exist (BASELINE.md: empty mount,
`"published": {}`), so the baseline constant below is an *estimate* of the C
reference's single-core rate: each backup = 25-candidate brute-force argmin,
each candidate needing the MCA stencil + 13 FT neighbor evals (~2-5k flops
plus pointer-chasing) -> ~40k backups/s/core. vs_baseline = value / (10x
that), i.e. >= 1.0 means the 10x target is met. Re-baseline when the real
reference appears.

One "backup" = one grid node's full Bellman update: min over all control
candidates of [g dt + e^{-beta dt} sum p_i v(nbr_i)] with TT neighbor
evaluation. Measured on the PRODUCTION path: the fused on-device VI sweep
(structured fiber-neighbor evaluation), steady-state, counting only
ACTIVE (unpadded) fiber nodes — the same work a rank-adaptive C
implementation would do.
"""

import json
import time

import numpy as np

C_REFERENCE_BACKUPS_PER_S = 40_000.0  # estimated single-core C rate (see above)
TARGET_MULTIPLIER = 10.0


def main():
    import jax

    from c3sc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from c3sc_tpu.models import make_quadcopter_problem
    from c3sc_tpu.solvers.fused import make_fused_vi

    prob = make_quadcopter_problem()
    grid = prob.default_grid(31)
    controls = prob.control_candidates(5)  # 25 candidates
    rmax = 16
    solve_fn, init_fn, step_fn = make_fused_vi(
        prob, grid, controls, rmax=rmax, tol=0.0, max_iters=10**9,
    )
    carry = init_fn(jax.random.key(0))
    # warm up: adapt ranks + compile
    carry = step_fn(carry, 30)
    jax.block_until_ready(carry.residual)

    reps = 200
    t0 = time.perf_counter()
    carry = step_fn(carry, reps)
    jax.block_until_ready(carry.residual)
    t1 = time.perf_counter()

    # active backups per iteration: every core-step evaluates its active
    # fiber block rl[k] * n_k * rr[k+1]; L2R touches cores 0..d-1 against
    # right sets, R2L touches cores d-1..0 against left sets.
    rl = np.asarray(carry.rl)
    rr = np.asarray(carry.rr)
    d = prob.dx
    n = np.asarray(grid.shape)
    per_iter = int(
        sum(rl[k] * n[k] * rr[k + 1] for k in range(d))
        + sum(rl[k] * n[k] * rr[k + 1] for k in range(d))
    )
    backups_per_s = per_iter * reps / (t1 - t0)
    vs = backups_per_s / (C_REFERENCE_BACKUPS_PER_S * TARGET_MULTIPLIER)
    print(
        json.dumps(
            {
                "metric": "bellman_backups_per_s_per_chip",
                "value": round(backups_per_s, 1),
                "unit": "backups/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
