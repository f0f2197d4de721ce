"""Checkpoint / resume for the TT solvers.

Reference mechanism: FT serialization is the whole story — ``valuef_save`` /
``function_train_save`` write cores to disk and examples reload instead of
re-solving (SURVEY.md §5). Here the checkpoint carries the FULL solver
state: padded TT cores + ranks, the cross pivot index sets, the outer-loop
iteration, RNG key data and residual history — so a killed VI run resumes
mid-iteration (the §5 TPU plan).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.ops.cross import CrossState
from c3sc_tpu.ops.tt import TT


def save_solver_state(path: str, v: TT, state: CrossState | None,
                      iteration: int, key=None, extras: dict | None = None) -> None:
    arrays = {f"core_{k}": np.asarray(c) for k, c in enumerate(v.cores)}
    arrays["ranks"] = np.asarray(v.ranks)
    meta = {"d": v.ndim, "iteration": int(iteration)}
    if state is not None:
        for k, a in enumerate(state.left):
            arrays[f"left_{k}"] = np.asarray(a)
        for k, a in enumerate(state.right):
            arrays[f"right_{k}"] = np.asarray(a)
        meta["has_state"] = True
    if key is not None:
        arrays["key_data"] = np.asarray(jax.random.key_data(key))
    if extras:
        meta["extras"] = extras
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


_FUSED_SIMPLE_FIELDS = (
    "ranks", "left", "right", "rl", "rr", "rlf", "rrf", "rows_l", "rows_r",
    "it", "residual", "long_res", "wstall", "v_sample", "sample_ref",
    "probe_cost", "best_cost", "ranks_best", "frozen", "freeze_mark",
    "best_long", "best_absdisp", "warm_until",
)


def _npz(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_fused_carry(path: str, carry, context: dict | None = None) -> None:
    """Serialize the FULL fused-solver state (``FusedCarry``) — cores, cross
    index sets, pivot rows, stopping state, probe-harvest snapshot — so a
    killed fused run resumes mid-VI (SURVEY.md §5 checkpoint row; VERDICT r1
    missing #5). Atomic: writes a temp file then renames over the target.

    ``context`` records what the carry was solved FOR (problem name, grid
    shape/bounds, rmax): without it a same-shape checkpoint from a different
    problem silently resumes into a wrong solve, and a mismatched grid fails
    deep in tracing with an opaque shape error (r2 advisor)."""
    import os

    arrays = {}
    for k, c in enumerate(carry.cores):
        arrays[f"core_{k}"] = np.asarray(c)
    for k, c in enumerate(carry.cores_best):
        arrays[f"core_best_{k}"] = np.asarray(c)
    for name in _FUSED_SIMPLE_FIELDS:
        arrays[name] = np.asarray(getattr(carry, name))
    meta = {"d": len(carry.cores), "kind": "fused_carry"}
    if context:
        meta["context"] = context
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    tmp = _npz(path) + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, _npz(path))


def fused_context(problem, grid, rmax: int) -> dict:
    """The identity block written into (and validated against) fused
    checkpoints: which solve this carry belongs to."""
    return {
        "problem": getattr(problem, "name", "problem"),
        "grid_shape": list(grid.shape),
        "lb": [float(x) for x in grid.lb],
        "ub": [float(x) for x in grid.ub],
        "rmax": int(rmax),
    }


def is_fused_checkpoint(path: str) -> bool:
    """True iff the npz at path was written by ``save_fused_carry``."""
    try:
        data = np.load(_npz(path))
        meta = json.loads(bytes(data["meta"]).decode())
        return meta.get("kind") == "fused_carry"
    except Exception:
        return False


def load_fused_carry(path: str, expect: dict | None = None):
    """Restore a ``FusedCarry`` saved by ``save_fused_carry``.

    ``expect`` (same keys as :func:`fused_context`) is validated against the
    checkpoint's recorded context — a clear ValueError here beats an opaque
    shape error deep in JAX tracing, or worse, a silent wrong-problem resume
    on a coincidentally same-shaped grid (r2 advisor)."""
    from c3sc_tpu.solvers.fused import FusedCarry

    data = np.load(_npz(path))
    meta = json.loads(bytes(data["meta"]).decode())
    if meta.get("kind") != "fused_carry":
        raise ValueError(
            f"{path} is not a fused solver checkpoint (kind="
            f"{meta.get('kind')!r}); pass a solver_state.npz written by "
            "save_fused_carry, or load it as a plain value function")
    saved = meta.get("context")
    if expect is not None and saved is not None:
        # rmax is excluded: growth legitimately resumes at a different cap
        for k in ("problem", "grid_shape", "lb", "ub"):
            if k in saved and saved[k] != expect[k]:
                raise ValueError(
                    f"checkpoint {path} was written for "
                    f"{saved.get('problem')!r} grid={saved.get('grid_shape')}"
                    f" bounds=[{saved.get('lb')}, {saved.get('ub')}], but "
                    f"this solve is {expect['problem']!r} "
                    f"grid={expect['grid_shape']} (mismatch on {k!r})")
    d = meta["d"]
    kw = {name: jnp.asarray(data[name]) for name in _FUSED_SIMPLE_FIELDS
          if name in data}
    # fields added after a checkpoint was written default to their
    # init_fn values (best_absdisp, r3) or best-effort reconstructions
    # (rlf/rrf fit ranks, r4 — exact for the square scheme where they
    # equal the bond sizes; oversampled pre-r4 checkpoints self-correct
    # within one unfrozen sweep)
    kw.setdefault("best_absdisp",
                  jnp.asarray(jnp.inf, kw["residual"].dtype))
    kw.setdefault("rlf", kw["rl"])
    kw.setdefault("rrf", kw["rr"])
    return FusedCarry(
        cores=tuple(jnp.asarray(data[f"core_{k}"]) for k in range(d)),
        cores_best=tuple(jnp.asarray(data[f"core_best_{k}"]) for k in range(d)),
        **kw,
    )


def load_solver_state(path: str) -> dict:
    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    d = meta["d"]
    v = TT(
        tuple(jnp.asarray(data[f"core_{k}"]) for k in range(d)),
        jnp.asarray(data["ranks"]),
    )
    out = {"v": v, "iteration": meta["iteration"], "extras": meta.get("extras", {})}
    if meta.get("has_state"):
        out["state"] = CrossState(
            left=[data[f"left_{k}"] for k in range(d + 1)],
            right=[data[f"right_{k}"] for k in range(d + 1)],
        )
    if "key_data" in data:
        out["key"] = jax.random.wrap_key_data(jnp.asarray(data["key_data"]))
    return out
