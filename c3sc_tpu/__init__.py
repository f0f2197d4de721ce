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

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import Boundary, ControlProblem, Obstacle

__version__ = "0.1.0"

__all__ = ["Grid", "ControlProblem", "Boundary", "Obstacle", "__version__"]
