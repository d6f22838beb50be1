"""Tonemap + display conversion (reference: renderer.cpp:2222-2240 +
RGBF32_to_RGB8, precomp.h:372-388)."""

from __future__ import annotations

import jax.numpy as jnp

from voxtracer.core.mathx import reinhard_jodie


def tonemap(color):
    return reinhard_jodie(color, jnp)


def to_rgb8(color):
    c = jnp.clip(tonemap(color), 0.0, 1.0)
    return (c * 255.0 + 0.5).astype(jnp.uint8)
