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
