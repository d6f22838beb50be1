"""Progressive accumulation (reference: renderer.cpp:1646-1828 —
``acc = lerp(acc, new, 1/(N+1))`` running mean, reset on any edit)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def accumulate(acc, new, num_rendered_frames):
    """One progressive-refinement step; returns the updated accumulator.
    num_rendered_frames is the count BEFORE this frame (reference weight,
    renderer.cpp:1651)."""
    w = 1.0 / (num_rendered_frames.astype(jnp.float32) + 1.0)
    return acc * (1.0 - w) + new * w


class ProgressiveState:
    """Host-side epoch counter + device accumulator (ResetAccumulator
    analogue, renderer.cpp:343-346)."""

    def __init__(self, height: int, width: int):
        self.acc = jnp.zeros((height, width, 3), jnp.float32)
        self.frames = 0

    def add(self, frame):
        self.acc = accumulate(self.acc, frame, jnp.int32(self.frames))
        self.frames += 1
        return self.acc

    def reset(self):
        self.acc = jnp.zeros_like(self.acc)
        self.frames = 0
