"""c3sc_tpu — TPU-native stochastic optimal control via tensor trains.

A brand-new JAX/XLA/Pallas framework with the capabilities of the C reference
``goroda/c3sc`` (+ the function-train subsystems of ``goroda/
Compressed-Continuous-Computation`` it relies on), re-designed TPU-first:

- batched, differentiable Kushner–Dupuis Markov-chain-approximation stencils
  (reference: ``c3sc/src/tensmarkov.c`` — line n/a, empty mount; see SURVEY.md)
- value/policy iteration as fused contractions over a rank-adaptive
  tensor-train compression of the value function
  (reference: ``c3sc/src/bellman.c``, ``C3 src/lib_clinalg/ft.c``)
- maxvol-based TT-cross approximation with padded static ranks
  (reference: ``C3 src/lib_clinalg`` ``ftapprox_cross``)
- batched inner minimization over controls
  (reference: ``C3 src/lib_optimization/optimization.c`` ``c3Opt``)
- vmapped Euler–Maruyama closed-loop rollouts with implicit feedback policies
  and a receding-horizon MPC driver (reference: ``c3sc/src/simulate.c``)

Layout:
  models/    problem specifications + the 5 reference systems
  ops/       MCA stencil, TT algebra, cross approximation, control argmin
  solvers/   dense-grid oracle DP, TT value/policy iteration
  sim/       SDE integrators, implicit policy, MPC
  parallel/  mesh / sharding for multi-chip pod slices
  utils/     checkpointing, metrics, config
"""

import jax as _jax

# Full-f32 matmuls, NOT the TPU default (which truncates f32 matmul inputs
# to bf16). The solver's numerics run through chains of small [R, R]-scale
# contractions — TT core products, QR/maxvol pivoting, interpolation solves
# — where bf16's ~1e-2 relative error is amplified by the Bellman feedback
# loop into a permanent 3e-2..6e-1 residual churn (measured on pendulum
# 2026-08-18: identical code converges to 9e-6 on CPU f32 and churns on TPU
# bf16). These matmuls are tiny and latency-bound, so full precision costs
# ~nothing; the MXU-heavy paths (candidate drift contraction, rollouts) are
# error-tolerant but stay consistent with the solver this way.
_jax.config.update("jax_default_matmul_precision", "highest")

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import Boundary, ControlProblem, Obstacle

__version__ = "0.1.0"

__all__ = ["Grid", "ControlProblem", "Boundary", "Obstacle", "__version__"]
