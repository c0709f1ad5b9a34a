"""Device mesh construction, single- and multi-host.

Replaces the reference's g_tensor_split VRAM-proportional row breakpoints
(ggml-cuda.cu:1995-2073) with a jax.sharding.Mesh: the "model" axis carries
Megatron-style tensor parallelism over ICI, the "data" axis carries batch
replicas (continuous batching / multi-host serving).

Multi-host (the reference has no distributed story — one process owns all
GPUs; SURVEY §2.9/§5.8 name mesh-over-ICI-and-DCN as the TPU-native
equivalent): `init_distributed` wires `jax.distributed.initialize` so every
host runs the same SPMD program, and `make_mesh` builds the mesh over GLOBAL
devices. `jax.devices()` orders devices by process, so with
(data=hosts, model=chips_per_host) the model axis stays inside each host
(psum rides ICI) while the data axis crosses hosts (DCN); a single "model"
axis spanning all global devices gives cross-host TP for models that exceed
one host (180B target). Validated by scripts/multihost_dryrun.py — two real
processes over a CPU collective backend.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> None:
    """Multi-controller init (call once per host before any jax use).

    With no arguments, TPU pod environments auto-discover; explicit
    coordinator/process arguments serve CPU/GPU clusters and tests."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    if local_device_ids is not None:
        kwargs.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kwargs)


def make_mesh(data: int = 1, model: int | None = None, devices=None) -> Mesh:
    """Build a (data, model) mesh over global devices.

    Multi-host: jax.devices() is ordered by process, so data=n_hosts puts
    each host's chips on one data row (model-axis collectives stay on ICI)."""
    devices = list(devices if devices is not None else jax.devices())
    if model is None:
        assert len(devices) % data == 0
        model = len(devices) // data
    n = data * model
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)
