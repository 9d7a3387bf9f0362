"""Multi-host plumbing on the virtual 8-device mesh: global mesh layout,
per-host batch feeding, and the scaling report — wired to the sharded fast
path the way a pod-slice deployment would use it."""

import numpy as np
import jax
import jax.numpy as jnp

from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.parallel import multihost
from waifu2x_tpu.parallel.fast_sharded import scale2x_u8_s2d_sharded
from waifu2x_tpu.pipeline import FastStack, scale2x_batch_u8_s2d


def test_global_mesh_default_layout():
    mesh = multihost.global_mesh()
    assert mesh.axis_names == ("dp", "sp")
    assert mesh.devices.size == jax.device_count()
    # single process: dp == 1, sp spans local devices
    assert mesh.devices.shape == (1, jax.device_count())


def test_shard_host_batch_and_sharded_convert(rng):
    mesh = multihost.global_mesh(dp=2, sp=4)
    fast = FastStack.build(
        init_params(jax.random.PRNGKey(5), WAIFU2X_7LAYER),
        scale_input=True, tile=(16, 16), interpret=True, dtype=jnp.float32)
    local = rng.random((4, 16, 32, 3), dtype=np.float32)
    global_batch = multihost.shard_host_batch(local, mesh)
    assert global_batch.shape == local.shape  # single process
    got = np.asarray(scale2x_u8_s2d_sharded(global_batch, fast, mesh))
    ref = np.asarray(scale2x_batch_u8_s2d(jnp.asarray(local), fast))
    np.testing.assert_array_equal(got, ref)


def test_scaling_report():
    r = multihost.ScalingReport(devices=4, mp_per_s=640.0,
                                baseline_mp_per_s=200.0)
    assert abs(r.efficiency - 0.8) < 1e-9
    assert "efficiency 80.0%" in r.line()
    assert multihost.ScalingReport(1, 100.0).efficiency is None
