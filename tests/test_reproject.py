"""Temporal reprojection tests (SURVEY.md §2 #15)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from voxtracer.render.camera import make_camera, primary_rays
from voxtracer.render.integrator import _pixel_grid
from voxtracer.render.reproject import (
    point_to_uv,
    render_reproject_frame,
    trace_reproject,
)
from voxtracer.scene import presets


def test_point_to_uv_roundtrip():
    """Points along primary rays must reproject to their own pixel uv."""
    cam = make_camera(pos=(0.2, 0.4, -1.5), target=(0.1, 0.0, 0.5), aspect=1.0)
    w = h = 32
    px, py = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    px, py = px.reshape(-1), py.reshape(-1)
    o, d = primary_rays(cam, w, h, px, py, None, jnp)
    pts = o + 1.7 * d
    uv = np.asarray(point_to_uv(cam, 1.0, pts))
    np.testing.assert_allclose(uv[:, 0], np.asarray(px) / w, atol=2e-3)
    np.testing.assert_allclose(uv[:, 1], np.asarray(py) / h, atol=2e-3)


def test_trace_reproject_decomposition():
    """albedo * illumination must reproduce a full color image: for a
    primary-visible diffuse surface the product is finite and positive
    where lit; G-buffer fields are populated."""
    scene, cfg = presets.glass_sphere_box(24, 24)
    cfg = dataclasses.replace(cfg, mode="path", max_bounces=2,
                              deterministic_lights=True)
    px, py = _pixel_grid(cfg)
    o, d = primary_rays(scene.camera, cfg.width, cfg.height, px, py, None, jnp)
    alb, illum, p0, n0, t0, m0 = trace_reproject(
        scene, cfg, o, d, jax.random.PRNGKey(0))
    alb, illum = np.asarray(alb), np.asarray(illum)
    assert np.isfinite(alb).all() and np.isfinite(illum).all()
    assert (alb >= 0).all()
    hit = np.asarray(m0) != 255
    assert hit.any()
    # hit points lie at o + t*d
    pts = np.asarray(o) + np.asarray(t0)[:, None] * np.asarray(d)
    np.testing.assert_allclose(np.asarray(p0)[hit], pts[hit], atol=1e-4)
    # normals are unit where hit
    nl = np.linalg.norm(np.asarray(n0)[hit], axis=-1)
    np.testing.assert_allclose(nl, 1.0, atol=1e-4)


def test_render_reproject_frame_runs_and_blends():
    scene, cfg = presets.glass_sphere_box(24, 24)
    cfg = dataclasses.replace(cfg, mode="path", max_bounces=2,
                              deterministic_lights=True)
    history = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    img1, hist1, aux = render_reproject_frame(scene, cfg, scene.camera,
                                              history, jax.random.PRNGKey(0))
    img2, hist2, _ = render_reproject_frame(scene, cfg, scene.camera,
                                            hist1, jax.random.PRNGKey(1))
    for x in (img1, hist1, img2, hist2):
        assert np.isfinite(np.asarray(x)).all()
    # history actually integrates (changes between frames, stays bounded)
    assert not np.allclose(np.asarray(hist1), np.asarray(hist2))
    assert np.asarray(img2).max() <= 50.0
