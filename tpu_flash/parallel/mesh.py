"""Mesh construction helpers for (data, model, seq) parallelism."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int = 1, model: int = 1, seq: int = 1, devices=None
) -> Mesh:
    """Build a ``(data, model, seq)`` mesh over ``data·model·seq`` devices.

    Axis roles: ``data`` = batch (DCN-friendly), ``model`` = tensor
    parallelism over heads/MLP (fast ICI), ``seq`` = ring-attention sequence
    sharding (ICI ring). On real hardware pass an explicit device list
    ordered so ``seq`` neighbours are ICI neighbours.
    """
    if devices is None:
        devices = jax.devices()
    n = data * model * seq
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, model, seq)
    return Mesh(arr, axis_names=("data", "model", "seq"))
