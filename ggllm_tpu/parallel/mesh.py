"""Device mesh construction.

Replaces the reference's g_tensor_split VRAM-proportional row breakpoints
(ggml-cuda.cu:1995-2073) with a jax.sharding.Mesh: the "model" axis carries
Megatron-style tensor parallelism over ICI, the "data" axis carries batch
replicas (continuous batching / multi-host serving).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int = 1, model: int | None = None, devices=None) -> Mesh:
    """Build a (data, model) mesh. model=None uses all remaining devices."""
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
