"""Aux subsystems: checkpoint/resume, metrics, config (SURVEY.md §5)."""

from c3sc_tpu.utils.checkpoint import load_solver_state, save_solver_state
from c3sc_tpu.utils.metrics import MetricsLogger

__all__ = ["save_solver_state", "load_solver_state", "MetricsLogger"]
