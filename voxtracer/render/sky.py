"""Equirect sky dome sampling (reference: Renderer::SampleSky,
renderer.cpp:2308-2326) — vectorized gather with the reference's fast
atan2/acos approximations and its flat-index clamp quirk."""

from __future__ import annotations

import jax.numpy as jnp

from voxtracer.core import mathx
from voxtracer.core.types import Sky


def sample_sky(sky: Sky, d, active_sky: bool, fallback):
    """d: [N, 3] unit directions -> [N, 3] radiance."""
    if not active_sky:
        return jnp.broadcast_to(jnp.asarray(fallback, jnp.float32), d.shape)
    h, w = sky.pixels.shape[:2]
    u = (w * mathx.atan2_fast(d[..., 2], d[..., 0], jnp) * mathx.INV_2PI - 0.5).astype(jnp.int32)
    v = (h * mathx.acos_fast(d[..., 1], jnp) * mathx.INV_PI - 0.5).astype(jnp.int32)
    idx = jnp.maximum(0, u + v * w)  # reference clamps only the low end
    idx = jnp.minimum(idx, h * w - 1)
    flat = sky.pixels.reshape(-1, 3)
    return sky.contribution * jnp.take(flat, idx, axis=0)
