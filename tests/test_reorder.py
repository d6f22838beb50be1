"""Per-bounce wavefront re-clustering (_trace_path_reordered) and its
live-prefix chunked dispatch (cfg.reorder_compact_chunks) are pure
DISPATCH-order changes: the morton sort permutes lanes and the chunk loop
slices the packed state, but every per-lane estimator is unchanged — only
the counter-hash sampler's lane->jitter assignment moves (same
distributions).  These tests pin that contract statistically: the image
MEAN under reorder / reorder+chunking must match the plain bounce loop's
mean within Monte-Carlo noise, and the final un-permutation must restore
pixel order (reference behavior: renderer.cpp:1076-1328's estimator does
not depend on ray processing order)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxtracer.config import RenderConfig
from voxtracer.render.integrator import trace_path

from test_paged import _scene

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene():
    return _scene()


def _cam_rays(scene, w=64, h=64):
    from voxtracer.render.camera import primary_rays

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                          jnp.arange(w, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    o, d = primary_rays(scene.camera, w, h, xx, yy, None, jnp)
    return o.reshape(-1, 3), d.reshape(-1, 3)


def _render(scene, cfg, key=0):
    o, d = _cam_rays(scene)
    rad = trace_path(scene, cfg, o, d, jax.random.PRNGKey(key))
    return np.asarray(rad)


def _mean_over_keys(scene, cfg, keys=4):
    return np.mean([_render(scene, cfg, k).mean() for k in range(keys)])


def test_reordered_mean_matches_plain(scene):
    base = RenderConfig(width=64, height=64, max_bounces=2,
                        bounce_reorder="none", compact_min=1)
    reo = dataclasses.replace(base, bounce_reorder="always",
                              bounce_reorder_period=1)
    m0 = _mean_over_keys(scene, base)
    m1 = _mean_over_keys(scene, reo)
    assert np.isfinite(m0) and np.isfinite(m1)
    assert abs(m1 - m0) <= 0.05 * max(abs(m0), 1e-3)


def test_chunked_reorder_matches_and_is_finite(scene):
    reo = RenderConfig(width=64, height=64, max_bounces=2,
                       bounce_reorder="always", bounce_reorder_period=1,
                       compact_min=1)
    chunked = dataclasses.replace(reo, reorder_compact_chunks=4)
    img_r = _render(scene, reo)
    img_c = _render(scene, chunked)
    assert np.isfinite(img_c).all() and (img_c >= 0).all()
    # same estimator, different lane->jitter assignment: means agree
    m0 = _mean_over_keys(scene, reo)
    m1 = _mean_over_keys(scene, chunked)
    assert abs(m1 - m0) <= 0.05 * max(abs(m0), 1e-3)
    # chunking must not leave any stale lanes: images differ only by
    # resampled jitter, so per-pixel values stay in the same range
    assert img_c.max() <= max(img_r.max() * 4.0, 1.0)


def test_chunked_indivisible_falls_back(scene):
    # n = 64*63 rays not divisible by 5 -> chunking silently disabled
    o, d = _cam_rays(scene, 64, 63)
    cfg = RenderConfig(width=64, height=63, max_bounces=1,
                       bounce_reorder="always", bounce_reorder_period=1,
                       compact_min=1, reorder_compact_chunks=5)
    rad = trace_path(scene, cfg, o, d, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(rad)).all()
