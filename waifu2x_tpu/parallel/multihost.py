"""Multi-host runtime glue (SURVEY.md §2 'Communication backend').

The reference has no distributed runtime at all (single process,
std::thread only — modelHandler.cpp:42-69); the TPU-native equivalent is
JAX's multi-controller runtime: every host runs the same program,
`jax.distributed.initialize` wires the cluster, meshes span all hosts'
devices, and the shard_map pipelines (parallel/sharded.py,
parallel/fast_sharded.py) run unchanged — halo ppermutes ride ICI inside a
slice and DCN across slices.

This module holds the host-side plumbing those pipelines need: cluster
init, global mesh construction, feeding per-host input shards, and a
throughput/scaling-efficiency report (the metric BASELINE.md tracks).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host cluster. No-op for a single process (the common
    single-host case and all tests); on a pod slice each host calls this
    before any other JAX operation, with TPU auto-detection filling the
    arguments when launched via the usual orchestrators."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def global_mesh(dp: int | None = None, sp: int | None = None) -> Mesh:
    """A ("dp", "sp") mesh over ALL devices in the cluster (local + remote).

    Default: "dp" spans hosts (frames data-parallel across DCN — no halo
    traffic crosses hosts) and "sp" spans each host's local devices (halo
    ppermutes stay on ICI). Override dp/sp for other layouts."""
    devices = jax.devices()
    n = len(devices)
    if dp is None and sp is None:
        dp = max(1, jax.process_count())
        sp = n // dp
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    if dp * sp != n:
        raise ValueError(f"mesh ({dp},{sp}) != {n} devices")
    return Mesh(np.asarray(devices).reshape(dp, sp), ("dp", "sp"))


def shard_host_batch(local_batch: np.ndarray, mesh: Mesh) -> jax.Array:
    """Assemble a GLOBAL array from per-host data: each host passes its own
    frames [n_local, h, w, c]; the result is the global [n_local * hosts,
    h, w, c] batch sharded P("dp", None, "sp", None) without any cross-host
    data movement (each host's frames land on its own devices)."""
    sharding = NamedSharding(mesh, P("dp", None, "sp", None))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    global_shape = (local_batch.shape[0] * jax.process_count(),
                    *local_batch.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, local_batch, global_shape)


@dataclasses.dataclass
class ScalingReport:
    """MP/s + scaling efficiency vs a single-device baseline (the >=80%
    north-star metric in BASELINE.md)."""

    devices: int
    mp_per_s: float
    baseline_mp_per_s: float | None = None

    @property
    def efficiency(self) -> float | None:
        if not self.baseline_mp_per_s:
            return None
        return self.mp_per_s / (self.baseline_mp_per_s * self.devices)

    def line(self) -> str:
        eff = self.efficiency
        eff_s = f", efficiency {eff * 100:.1f}%" if eff is not None else ""
        return (f"{self.devices} device(s): {self.mp_per_s:.1f} MP/s"
                f"{eff_s}")


def measure_throughput(step_fn, batch: jax.Array, out_pixels: int,
                       iters: int = 10,
                       baseline_mp_per_s: float | None = None
                       ) -> ScalingReport:
    """Steady-state MP/s of `step_fn(batch)` on the current topology.
    Synchronizes via a scalar readback (reliable under the remote relay)."""
    def sync(arr):
        # scalar readback: the only reliable sync under the remote relay
        return float(jax.numpy.max(arr.astype(jax.numpy.float32)))

    sync(step_fn(batch))  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step_fn(batch)
    sync(out)
    dt = time.perf_counter() - t0
    return ScalingReport(len(jax.devices()),
                         out_pixels * iters / dt / 1e6,
                         baseline_mp_per_s)
