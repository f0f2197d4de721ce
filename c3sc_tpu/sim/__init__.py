"""Closed-loop simulation: SDE integrators, implicit feedback policies,
batched Monte-Carlo rollouts, receding-horizon MPC."""

from c3sc_tpu.sim.policy import make_implicit_policy
from c3sc_tpu.sim.mpc_shoot import receding_horizon_rollout
from c3sc_tpu.sim.ilqr import make_ilqr_plan
from c3sc_tpu.sim.terminal import TerminalLQR, make_terminal_lqr
from c3sc_tpu.sim.integrators import (
    Trajectory, rollout, trajectory_load, trajectory_save,
)

__all__ = ["make_implicit_policy", "Trajectory", "rollout",
           "trajectory_save", "trajectory_load",
           "receding_horizon_rollout", "make_ilqr_plan",
           "TerminalLQR", "make_terminal_lqr"]
