"""Multi-host initialization (pod slices over DCN).

The reference is single-process (SURVEY.md §2.3); this is the TPU-native
multi-host entry: ``jax.distributed.initialize`` + a process-spanning mesh.
On a pod slice, launch one process per host with the same program;
collectives ride ICI within a slice and DCN across hosts.

Solves/s scaling target (BASELINE.md): >= 80% efficiency from 1 to N>=2
hosts — achieved here by sharding only embarrassingly-parallel axes
(fiber/node batches, rollout scenarios) and keeping TT cores replicated, so
the only cross-host traffic is the pmin/psum reductions.
"""

from __future__ import annotations

import jax


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Initialize multi-host JAX. No-op on a single process without args
    (TPU pod environments auto-discover via the TPU runtime)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:  # already initialized / single host
        if "already" not in str(e).lower() and num_processes not in (None, 1):
            raise


def global_mesh(axes=("fibers", "ctrl"), ctrl: int = 1):
    """Mesh over ALL processes' devices (call after initialize_distributed)."""
    from c3sc_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    n = len(devs)
    assert n % ctrl == 0
    if len(axes) == 1:
        assert ctrl == 1, "ctrl > 1 needs a 'ctrl' mesh axis"
        shape = (n,)
    else:
        shape = (n // ctrl, ctrl) + (1,) * (len(axes) - 2)
    return make_mesh(axes=axes, shape=shape, devices=devs)
