"""Multi-chip parallelism: device mesh + sharded Bellman/rollout steps.

The reference is single-process C with no distributed runtime (SURVEY.md
§2.3); this subsystem is *new* TPU-native capability: fiber batches, control
candidates, and Monte-Carlo rollouts shard over a ``jax.sharding.Mesh`` with
XLA collectives riding ICI.
"""

from c3sc_tpu.parallel.mesh import make_mesh
from c3sc_tpu.parallel.sharded import make_sharded_bellman, make_sharded_rollout

__all__ = ["make_mesh", "make_sharded_bellman", "make_sharded_rollout"]
