"""Solvers: dense-grid oracle DP (<=3D validation) and TT value/policy
iteration (the production path)."""

from c3sc_tpu.solvers.dense import DenseSolution, dense_policy, dense_vi
from c3sc_tpu.solvers.fused import (FusedVISolution, fused_tt_vi,
                                    fused_tt_vi_refined)
from c3sc_tpu.solvers.ttvi import TTVISolution, tt_vi
from c3sc_tpu.solvers.ttpi import TTPISolution, tt_pi
from c3sc_tpu.solvers.polish import PolishResult, tt_polish
from c3sc_tpu.solvers.local_patch import (LocalPatch, make_patched_value_fn,
                                          solve_local_patch, two_level_solve)
from c3sc_tpu.solvers.twogrid import coarse_correct, coarse_grid
from c3sc_tpu.solvers.pials import PIALSResult, pi_als
from c3sc_tpu.solvers.gating import gated_apply, make_greedy_probe

__all__ = [
    "DenseSolution", "dense_vi", "dense_policy",
    "TTVISolution", "tt_vi",
    "TTPISolution", "tt_pi",
    "FusedVISolution", "fused_tt_vi", "fused_tt_vi_refined",
    "PolishResult", "tt_polish",
    "LocalPatch", "solve_local_patch", "make_patched_value_fn",
    "two_level_solve",
    "coarse_correct", "coarse_grid",
    "PIALSResult", "pi_als",
    "gated_apply", "make_greedy_probe",
]
