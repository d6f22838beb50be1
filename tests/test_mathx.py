"""Unit tests for shared numerics (voxtracer/core/mathx.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxtracer.core import mathx
from voxtracer.core.sampling import point_in_circle, positive_octant_dir, uniform_hemisphere_dir


def test_reflect_involution():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(100, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    n = rng.normal(size=(100, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    r = mathx.reflect(d, n)
    np.testing.assert_allclose(np.linalg.norm(r, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(mathx.dot3(r, n), -mathx.dot3(d, n), atol=1e-5)


def test_refract_snell():
    # 45 deg incidence air->glass
    d = np.array([[np.sqrt(0.5), -np.sqrt(0.5), 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    r = mathx.refract(d, n, np.float32(1.0 / 1.5), np)
    sin_out = np.abs(r[0, 0]) / np.linalg.norm(r[0])
    np.testing.assert_allclose(sin_out, np.sin(np.radians(45)) / 1.5, atol=1e-5)


def test_refract_ratio_one_is_identity():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(50, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    n = rng.normal(size=(50, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    # renderer invariant: the shading normal opposes the incoming direction
    n = np.where(mathx.dot3(-d, n)[:, None] < 0, -n, n)
    # near-grazing rays lose precision in the sqrt cancellation (float32),
    # same as the reference formula (renderer.cpp:919-925)
    keep = mathx.dot3(-d, n) > 0.1
    r = mathx.refract(d, n, np.float32(1.0), np)
    np.testing.assert_allclose(r[keep], d[keep], atol=2e-3)


def test_offset_ray_moves_off_surface():
    p = np.array([[1.0, -2.0, 0.001], [100.0, 0.5, -7.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]], np.float32)
    q = mathx.offset_ray(p, n, np)
    assert not np.array_equal(q, p)
    # nudge is tiny
    np.testing.assert_allclose(q, p, atol=1e-2)
    # numpy and jax agree bit-for-bit
    qj = np.asarray(mathx.offset_ray(jnp.asarray(p), jnp.asarray(n), jnp))
    np.testing.assert_array_equal(q, qj)


def test_fast_trig_matches_reference_shape():
    x = np.linspace(-0.999, 0.999, 200, dtype=np.float32)
    np.testing.assert_allclose(mathx.acos_fast(x, np), np.arccos(x), atol=2e-4)
    y = np.linspace(-3, 3, 77, dtype=np.float32)
    xs = np.linspace(-3, 3, 77, dtype=np.float32) + 0.13
    np.testing.assert_allclose(
        mathx.atan2_fast(y, xs, np), np.arctan2(y, xs), atol=2e-2)


def test_tonemap_range_and_identity_black():
    c = np.abs(np.random.default_rng(3).normal(size=(64, 3))).astype(np.float32) * 5
    t = mathx.reinhard_jodie(c, np)
    # Reinhard-Jodie is NOT bounded by 1 for saturated colors (the
    # luminance-adjusted term can exceed 1); the reference clamps only at
    # the RGB8 conversion (precomp.h:372-388) — we assert non-negativity,
    # finiteness, and compression of bright values.
    assert (t >= 0).all() and np.isfinite(t).all()
    assert (t.max(axis=-1) <= c.max(axis=-1) + 1e-6).all()
    np.testing.assert_allclose(mathx.reinhard_jodie(np.zeros((1, 3), np.float32), np), 0.0)


def test_ycocg_roundtrip():
    rgb = np.random.default_rng(4).random((32, 3)).astype(np.float32)
    back = mathx.ycocg_to_rgb(mathx.rgb_to_ycocg(rgb, np), np)
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_samplers_distributions():
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (20000, 3))
    d = np.asarray(positive_octant_dir(g, jnp))
    assert (d >= 0).all()  # positive octant quirk
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)

    n = np.array([0.0, 1.0, 0.0], np.float32)
    h = np.asarray(uniform_hemisphere_dir(n, np.asarray(g), np))
    assert (mathx.dot3(h, n) >= 0).all()
    np.testing.assert_allclose(np.abs(h.mean(0))[0::2], 0.0, atol=0.02)

    u = np.asarray(jax.random.uniform(key, (20000, 2)))
    disk = point_in_circle(u, np)
    r = np.linalg.norm(disk, axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    np.testing.assert_allclose((r < 0.5).mean(), 0.25, atol=0.02)  # uniform area


def test_schlick_limits():
    assert mathx.schlick_nonmetal(1.0) == pytest.approx(0.04)
    assert mathx.schlick_nonmetal(0.0) == pytest.approx(1.0)
    assert mathx.schlick(np.float32(1.0), np.float32(1.5), np) == pytest.approx(0.04, abs=1e-3)
