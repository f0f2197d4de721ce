"""Compute-path ops: MCA stencil, tensor-train algebra, cross approximation,
control argmin, and Pallas kernels."""

from c3sc_tpu.ops.mca import transition, transition_batch, node_terminal

__all__ = ["transition", "transition_batch", "node_terminal"]
