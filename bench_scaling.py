"""Solves/s scaling benchmark: batched independent fused-VI solves sharded
over an N-device mesh, N in {1, 2, 4, 8}.

BASELINE.md target: >= 80% solves/s scaling efficiency from 1 host to
N >= 2 hosts. Only ONE real TPU chip is reachable in this environment, so
the mesh is the virtual-device CPU mesh (the same substitute SURVEY.md §4
prescribes for distributed tests).

Methodology (reworked in round 3 after the r2 advisor findings):

- Each N runs in its OWN subprocess pinned with ``taskset`` to N physical
  cores (capped at os.cpu_count()): one "virtual host" = one core, matching
  the real multi-host setting where every host brings its own compute. An
  unpinned in-process comparison is dishonest on a small box: the N=1 run's
  XLA intra-op threading borrows ALL cores, deflating t_1 and with it the
  1->N efficiency (this, plus timing a recompile, produced both the
  too-good 0.92 and the too-bad 0.45 numbers seen in round 2).
- The warmup call uses the SAME static ``n_iters`` as the timed call, so
  the timed region never contains a compile (r2 advisor, high severity).
- Work per device is FIXED (vmapped fori_loop, no lockstep-convergence
  confound): efficiency_N = wall_1 / wall_N, ideal = 1.
- Walls are >= ~30 s at the default iters and the headline is the MEDIAN
  of ``repeats`` timed runs (max-of-N is an upward-biased estimator —
  r2 advisor, medium severity); per-run walls stay in the artifact.

This machine has 2 physical cores: efficiency at N > 2 is physically capped
at n_cores/N and recorded for completeness only; the headline is 1 -> 2
(the BASELINE criterion is "N >= 2").

Writes BENCH_SCALING.json and prints one JSON line.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

DEFAULT_ITERS = 1500
DEFAULT_REPEATS = 3


def worker(n: int, iters: int, repeats: int, grid_n: int, rmax: int):
    """Child-process entry: time `repeats` fixed-work stepper calls."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from c3sc_tpu.models import make_pendulum_problem
    from c3sc_tpu.parallel import make_mesh
    from c3sc_tpu.parallel.multi_solve import make_batch_stepper

    prob = make_pendulum_problem()
    grid = prob.default_grid(grid_n)
    controls = prob.control_candidates(9)
    devices = jax.devices()
    if n > len(devices):
        print(json.dumps({"n": n, "error": "not enough devices"}))
        return
    mesh = make_mesh(axes=("fibers",), shape=(n,), devices=devices[:n])
    init, step = make_batch_stepper(
        prob, grid, controls, rmax=rmax, mesh=mesh, axis="fibers"
    )
    stacked = init([jax.random.key(100 + i) for i in range(n)])
    # warmup with the SAME static n_iters as the timed calls: compiles the
    # exact executable being timed AND burns in rank adaptation
    stacked = step(stacked, iters)
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        stacked = step(stacked, iters)
        walls.append(time.perf_counter() - t0)
    print(json.dumps({"n": n, "walls": walls}))


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else 0.5 * (s[m - 1] + s[m])


def run(ns=(1, 2, 4, 8), iters=DEFAULT_ITERS, repeats=DEFAULT_REPEATS,
        grid_n=31, rmax=12):
    """Spawn one pinned subprocess per N; return per-N timing dict."""
    ncores = os.cpu_count() or 1
    have_taskset = shutil.which("taskset") is not None
    results = {}
    for n in ns:
        cores = ",".join(str(i) for i in range(min(n, ncores)))
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--n", str(n), "--iters", str(iters),
               "--repeats", str(repeats), "--grid-n", str(grid_n),
               "--rmax", str(rmax)]
        if have_taskset:
            cmd = ["taskset", "-c", cores] + cmd
        env = dict(os.environ)
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={max(ns)}"
            ).strip()
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=3600)
        rec = None
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
        if rec is None or "walls" not in rec:
            print(f"bench_scaling: worker n={n} failed "
                  f"(rc={out.returncode}):\n{out.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        walls = rec["walls"]
        results[n] = {
            "walls_s": [round(w, 4) for w in walls],
            "wall_s": round(_median(walls), 4),
            "wall_s_best": round(min(walls), 4),
            "solves_per_s": round(n * iters / _median(walls), 4),
            "cores": cores if have_taskset else f"unpinned({ncores})",
        }
    if 1 in results:
        base_med = results[1]["wall_s"]
        base_best = results[1]["wall_s_best"]
        for n, r in results.items():
            r["efficiency"] = round(base_med / r["wall_s"], 4)
            r["efficiency_best"] = round(base_best / r["wall_s_best"], 4)
    return results


def main():
    results = run()
    n_cores = os.cpu_count()
    eff2 = results.get(2, {}).get("efficiency", float("nan"))
    artifact = {
        "metric": "solves_per_s_scaling_efficiency_1_to_2",
        "value": round(eff2, 3),
        "unit": "fraction",
        "vs_baseline": round(eff2 / 0.8, 3),
        "detail": {
            "n_physical_cores": n_cores,
            "methodology": (
                "each N in its own subprocess pinned to N cores (1 virtual "
                "host = 1 core); warmup compiles the exact timed "
                "executable; fixed work per device; median of "
                f"{DEFAULT_REPEATS} x ~{DEFAULT_ITERS}-iteration walls"
            ),
            "note": (
                f"efficiency at N > {n_cores} cores is physically capped "
                f"at {n_cores}/N on this box"
            ),
            "per_n": {str(n): r for n, r in results.items()},
        },
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SCALING.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("metric", "value", "unit", "vs_baseline")}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--iters", type=int, default=DEFAULT_ITERS)
    ap.add_argument("--repeats", type=int, default=DEFAULT_REPEATS)
    ap.add_argument("--grid-n", type=int, default=31)
    ap.add_argument("--rmax", type=int, default=12)
    args = ap.parse_args()
    if args.worker:
        worker(args.n, args.iters, args.repeats, args.grid_n, args.rmax)
    else:
        main()
