"""Benchmark: Bellman backups/s/chip on the flagship 6D quadcopter config.

North-star metric (BASELINE.json): backups/s per chip >= 10x a single-core C
reference. No published reference numbers exist (BASELINE.md: empty mount,
`"published": {}`), so the baseline constant below is an *estimate* of the C
reference's single-core rate: each backup = 25-candidate brute-force argmin,
each candidate needing the MCA stencil + 13 FT neighbor evals (~2-5k flops
plus pointer-chasing) -> ~40k backups/s/core. vs_baseline = value / (10x
that) i.e. >= 1.0 means the 10x target is met. Re-baseline when the real
reference appears.

One "backup" = one grid node's full Bellman update: min over all control
candidates of [g dt + e^{-beta dt} sum p_i v(nbr_i)] with TT neighbor evals.
"""

import json
import time

import numpy as np

C_REFERENCE_BACKUPS_PER_S = 40_000.0  # estimated single-core C rate (see above)
TARGET_MULTIPLIER = 10.0


def main():
    import jax
    import jax.numpy as jnp

    from c3sc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from c3sc_tpu.models import make_quadcopter_problem
    from c3sc_tpu.ops.tt import tt_random
    from c3sc_tpu.solvers.ttvi import make_bellman_kernel

    prob = make_quadcopter_problem()
    grid = prob.default_grid(31)
    controls = prob.control_candidates(5)  # 25 candidates
    chunk = 8192
    bellman = make_bellman_kernel(prob, grid, controls, chunk=chunk)
    v = tt_random(jax.random.key(0), grid.shape, (1, 8, 14, 16, 14, 8, 1), rmax=16)

    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        np.stack([rng.integers(0, n, size=chunk) for n in grid.shape], -1),
        jnp.int32,
    )
    # warmup / compile
    bellman(v, idx).block_until_ready()
    reps = 30
    t0 = time.perf_counter()
    for _ in range(reps):
        out = bellman(v, idx)
    out.block_until_ready()
    t1 = time.perf_counter()
    backups_per_s = chunk * reps / (t1 - t0)
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
