"""Aggregate per-seed north-star artifacts into the headline NORTHSTAR.json.

VERDICT r4 weak #1: a single solver lineage is a seed lottery at these
tolerances — the committed r4 headline was the lucky draw. Round-5 rule:
the artifact passes only if EVERY seed passes, and the headline numbers
are the WORST CASE across seeds. All per-seed artifacts stay committed
alongside.

Run after the per-seed runs:
  PYTHONPATH=... python experiments/quad_dense_oracle.py --seed K   (K=0,1,2)
  python experiments/northstar_aggregate.py
"""

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    paths = sorted(glob.glob(os.path.join(ROOT, "NORTHSTAR_seed*.json")))
    assert paths, "no per-seed artifacts found"
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append((os.path.basename(p), json.load(f)))

    def key_q95(r):
        return r["value_parity_rel_to_range"]["deployed_composite"][
            "interior"]["q95"]

    def key_dep(r):
        d = r.get("deployment_mpc")
        return d["signed_rel"] if d else r["cost_rel_deviation"]

    worst_q95 = max(runs, key=lambda nr: key_q95(nr[1]))
    worst_dep = max(runs, key=lambda nr: key_dep(nr[1]))
    all_pass = all(r["pass"] for _, r in runs)

    headline = dict(worst_q95[1])  # base = worst-value-parity seed
    headline["metric"] = "quadcopter_6d_vs_dense_oracle_multiseed"
    headline["seeds"] = {
        name: {
            "seed": r["config"]["seed"],
            "pass": r["pass"],
            "value_q95_interior": key_q95(r),
            "greedy_cost_rel": r["cost_rel_deviation"],
            "greedy_pass_two_sided": r["greedy_pass_two_sided"],
            "deployment_signed_rel": key_dep(r),
            "survival": r["production"]["survival"],
        }
        for name, r in runs
    }
    headline["headline_policy"] = (
        "worst case across independent solver seeds: the reported "
        "value_parity/cost rows are the worst-q95 seed's "
        f"({worst_q95[0]}); deployment worst case is "
        f"{worst_dep[0]} at {key_dep(worst_dep[1]):+.4f}; pass requires "
        "EVERY seed to pass (VERDICT r4 weak #1)")
    headline["pass"] = bool(all_pass)
    out = os.path.join(ROOT, "NORTHSTAR.json")
    with open(out, "w") as f:
        json.dump(headline, f, indent=1)
    print(json.dumps({"pass": all_pass,
                      "n_seeds": len(runs),
                      "worst_q95": key_q95(worst_q95[1]),
                      "worst_deployment": key_dep(worst_dep[1])}))


if __name__ == "__main__":
    main()
