"""Multi-device sharding tests on the 8-virtual-CPU-device mesh (the
SURVEY.md §4 substitute for distributed tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_pendulum_problem, make_quadcopter_problem
from c3sc_tpu.ops.tt import tt_random
from c3sc_tpu.parallel import make_mesh, make_sharded_bellman
from c3sc_tpu.solvers.ttvi import make_bellman_kernel


@pytest.fixture(scope="module")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


def test_sharded_bellman_matches_single_device(eight_devices):
    prob = make_quadcopter_problem()
    grid = prob.default_grid(9)
    controls = prob.control_candidates((8, 2))  # C=16, divisible by ctrl=2
    v = tt_random(jax.random.key(0), grid.shape, (1, 3, 4, 4, 4, 3, 1), rmax=6)
    B = 64
    rng = np.random.default_rng(2)
    idx = jnp.asarray(
        np.stack([rng.integers(0, n, size=B) for n in grid.shape], -1), jnp.int32
    )
    # reference: single-device kernel
    ref_kernel = make_bellman_kernel(prob, grid, controls, chunk=B)
    ref = np.asarray(ref_kernel(v, idx))
    # sharded 4x2 mesh
    mesh = make_mesh(axes=("fibers", "ctrl"), shape=(4, 2), devices=eight_devices)
    backup = make_sharded_bellman(prob, grid, mesh)
    with mesh:
        out = np.asarray(backup(v, idx, jnp.asarray(controls, jnp.float32)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
    ge.dryrun_multichip(8)
    ge.dryrun_multichip(4)
