"""Round-5 MFU campaign, step 1: per-phase time budget of the fused iter.

VERDICT r4 next #4: "produce a per-phase time budget of the 2.75 ms fused
iteration (the 28%-maxvol measurement exists; account for the rest),
compute arithmetic intensity of the fiber backup".

Phases of one fused VI iteration (31^6 quad, rmax 16, steady ranks):
  - EVAL: structured fiber-neighbor evaluation + MCA stencil + candidate
    argmin, for each of the 2d core-steps (d L2R + d R2L);
  - FIT: _cholqr2 orthogonalization + rank logic + interp factor;
  - SWAPS: 6 sequential maxvol swap refinements (measured 28% in r2).

This script times (a) the full iteration, (b) an eval-only program that
runs the same 2d struct_eval+stencil core-steps back-to-back, (c) the
swap-free iteration (n_swaps bisect exists in `_pivot_rows` notes).
It also prints the roofline inputs: XLA flop count, bytes touched
(estimated), so docs/PERF_R5.md can state where the wall comes from.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/perf_phase_r5.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.ops import mca
from c3sc_tpu.solvers import fused as fused_mod
from c3sc_tpu.solvers.fused import make_structured_fiber_eval


def main(grid_n=31, rmax=16, reps=200, warmup=30):
    prob = make_quadcopter_problem()
    grid = prob.default_grid(grid_n)
    controls = prob.control_candidates(5)
    uc = jnp.asarray(controls, jnp.float32)
    d, R = prob.dx, rmax
    shape = grid.shape

    _, init_fn, step_fn, _ = fused_mod.make_fused_vi(
        prob, grid, controls, rmax=rmax, tol=0.0, max_iters=10 ** 9)
    carry = init_fn(jax.random.key(0))
    carry = step_fn(carry, warmup)
    jax.block_until_ready(carry.residual)

    t0 = time.perf_counter()
    carry = step_fn(carry, reps)
    jax.block_until_ready(carry.residual)
    full_ms = 1e3 * (time.perf_counter() - t0) / reps
    print(f"full iteration: {full_ms:.3f} ms")

    # ---- eval-only program: 2d struct-eval + stencil core-steps --------
    struct_eval = [make_structured_fiber_eval(grid, k, R) for k in range(d)]
    dimcol = jnp.arange(d)

    def build_idx(k, left_k, right_k1):
        n = shape[k]
        A = jnp.broadcast_to(left_k[:, None, None, :], (R, n, R, d))
        Bm = jnp.broadcast_to(right_k1[None, None, :, :], (R, n, R, d))
        I = jnp.broadcast_to(jnp.arange(n)[None, :, None, None],
                             (R, n, R, d))
        idx = jnp.where(dimcol < k, A, jnp.where(dimcol == k, I, Bm))
        return idx.astype(jnp.int32)

    vb = prob.value_bounds

    def eval_core(cores, k, left_k, right_k1):
        n = shape[k]
        vp, vm, _ = struct_eval[k](cores, left_k, right_k1)
        B = R * n * R
        flat_idx = build_idx(k, left_k, right_k1).reshape(-1, d)
        x = grid.index_to_state(flat_idx).astype(jnp.float32)
        vn = jnp.stack([vp, vm], 0).reshape(2, d, B).transpose(2, 0, 1)
        if vb is not None:
            vn = jnp.clip(vn, vb[0], vb[1])
        pp, pm, dtt = mca.transition_all_controls(prob, grid, x, uc)
        g = mca.stage_cost_all(prob, x, uc)
        expect = jnp.sum(pp * vn[None, :, 0] + pm * vn[None, :, 1], -1)
        rhs = g * dtt + jnp.exp(-prob.beta * dtt) * expect
        return jnp.min(rhs, axis=0).sum()

    @jax.jit
    def eval_all(cores, left, right, n_loops):
        def body(_, acc):
            s = acc
            for k in range(d):
                s = s + eval_core(cores, k, left[k], right[k + 1])
            for k in range(d - 1, -1, -1):
                s = s + eval_core(cores, k, left[k], right[k + 1])
            return s
        return jax.lax.fori_loop(0, n_loops, body, 0.0)

    cores = carry.cores
    left = carry.left
    right = carry.right
    r = eval_all(cores, left, right, 3)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = eval_all(cores, left, right, reps)
    jax.block_until_ready(r)
    eval_ms = 1e3 * (time.perf_counter() - t0) / reps
    print(f"eval-only (2d core-steps): {eval_ms:.3f} ms "
          f"({eval_ms / full_ms:.1%} of full)")

    # ---- flops + bytes of ONE iteration (XLA cost analysis) ------------
    comp = step_fn.lower(carry, 1).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", -1))
    bytes_ = float(ca.get("bytes accessed", -1))
    backups = int(sum(np.asarray(carry.rl)[k] * shape[k]
                      * np.asarray(carry.rr)[k + 1] for k in range(d)) * 2)
    print(f"XLA flops/iter: {flops:.3e}  bytes/iter: {bytes_:.3e}  "
          f"backups/iter: {backups}")
    print(f"arithmetic intensity: {flops / max(bytes_, 1):.2f} flop/byte")
    print(f"flop time at 50 TF/s: {flops / 50e12 * 1e3:.4f} ms; "
          f"byte time at 800 GB/s: {bytes_ / 800e9 * 1e3:.4f} ms; "
          f"measured: {full_ms:.3f} ms")
    print(f"=> overhead-bound factor: "
          f"{full_ms / max(flops / 50e12 * 1e3, bytes_ / 800e9 * 1e3):.0f}x "
          f"above the roofline")


if __name__ == "__main__":
    main()
