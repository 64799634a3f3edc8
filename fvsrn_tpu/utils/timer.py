"""Timing utilities.

``GPUTimer`` mirrors the reference's CUDA-event timer exposed to Python
(reference: bindings/bindings.cpp:101-131 ``GPUTimer``; pyrenderer.sync at
:274): on TPU, accurate device timing is wall-clock around
``block_until_ready`` (the XLA dispatch queue is drained by the sync, like
cudaEventSynchronize).
"""
from __future__ import annotations

import time

import jax


def sync():
    """Drain the device queue (reference: pyrenderer.sync)."""
    jax.device_put(0.0).block_until_ready()


class GPUTimer:
    def __init__(self):
        self._t0 = None

    def start(self):
        sync()
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        """Returns elapsed milliseconds since start()."""
        sync()
        if self._t0 is None:
            raise RuntimeError("timer not started")
        ms = (time.perf_counter() - self._t0) * 1000.0
        self._t0 = None
        return ms
