"""Solvers: dense-grid oracle DP (<=3D validation) and TT value/policy
iteration (the production path)."""

from c3sc_tpu.solvers.dense import DenseSolution, dense_policy, dense_vi

__all__ = ["DenseSolution", "dense_vi", "dense_policy"]
