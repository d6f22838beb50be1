"""Vectorized analytic primitive intersectors (spheres, triangles).

Reference: src/BVH/Shapes.h — geometric sphere test and positioned
Möller–Trumbore triangles.  Here each test is a [N rays, M prims] broadcast
with a min-reduce; fused by XLA into the trace step.
"""

from __future__ import annotations

import jax.numpy as jnp

from voxtracer.core.mathx import dot3
from voxtracer.core.types import MAT_NONE, Spheres, Triangles

BIG = 1e34


def spheres_nearest(sp: Spheres, o, d):
    """Closest sphere hit per ray on a FRESH ray (t starts at BIG, matching
    renderer.cpp:996-1006).  Returns (t, mat, normal, inside)."""
    n = o.shape[0]
    if sp.center.shape[0] == 0:
        return (jnp.full(n, BIG), jnp.full(n, MAT_NONE, jnp.int32),
                jnp.zeros((n, 3)), jnp.zeros(n, bool))
    to_ray = o[:, None, :] - sp.center[None, :, :]  # [N, M, 3]
    b = dot3(to_ray, d[:, None, :])
    c = dot3(to_ray, to_ray) - sp.radius[None, :] ** 2
    disc = b * b - c
    reject = ((c > 0.0) & (b > 0.0)) | (disc < 0.0)
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where(reject | (t < 0.0), BIG, t)
    best = jnp.argmin(t, axis=1)
    t_best = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
    hit = t_best < BIG
    center = sp.center[best]
    radius = sp.radius[best]
    p = o + t_best[:, None] * d
    n_out = (p - center) / radius[:, None]
    outside = dot3(d, n_out) < 0.0
    normal = jnp.where(outside[:, None], n_out, -n_out)
    mat = jnp.where(hit, sp.material[best], MAT_NONE)
    return t_best, mat, normal, hit & ~outside


def triangles_nearest(tr: Triangles, o, d):
    """Closest Möller–Trumbore hit per ray (Shapes.h:79-111)."""
    n = o.shape[0]
    if tr.v0.shape[0] == 0:
        return (jnp.full(n, BIG), jnp.full(n, MAT_NONE, jnp.int32), jnp.zeros((n, 3)))
    p1 = tr.position + tr.v0
    p2 = tr.position + tr.v1
    p3 = tr.position + tr.v2
    e1 = (p2 - p1)[None, :, :]
    e2 = (p3 - p1)[None, :, :]
    dv = d[:, None, :]
    h = jnp.cross(dv, e2)
    a = dot3(e1, h)
    parallel = jnp.abs(a) < 1e-4
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = o[:, None, :] - p1[None, :, :]
    u = f * dot3(s, h)
    q = jnp.cross(s, e1)
    v = f * dot3(dv, q)
    t = f * dot3(e2, q)
    bad = parallel | (u < 0) | (u > 1) | (v < 0) | (u + v > 1) | (t <= 1e-4)
    t = jnp.where(bad, BIG, t)
    best = jnp.argmin(t, axis=1)
    t_best = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
    hit = t_best < BIG
    e1b, e2b = (p2 - p1)[best], (p3 - p1)[best]
    n_geo = jnp.cross(e1b, e2b)
    n_geo = n_geo / jnp.maximum(jnp.sqrt((n_geo * n_geo).sum(-1, keepdims=True)), 1e-20)
    normal = jnp.where(dot3(d, n_geo)[:, None] < 0.0, n_geo, -n_geo)
    mat = jnp.where(hit, tr.material[best], MAT_NONE)
    return t_best, mat, normal


def spheres_occluded(sp: Spheres, o, d, t_limit):
    """Any-hit (Shapes.h:44-62): t in [0, t_limit]."""
    if sp.center.shape[0] == 0:
        return jnp.zeros(o.shape[0], bool)
    to_ray = o[:, None, :] - sp.center[None, :, :]
    b = dot3(to_ray, d[:, None, :])
    c = dot3(to_ray, to_ray) - sp.radius[None, :] ** 2
    disc = b * b - c
    reject = ((c > 0.0) & (b > 0.0)) | (disc < 0.0)
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    ok = ~reject & (t >= 0.0) & (t <= t_limit[:, None])
    return jnp.any(ok, axis=1)


def triangles_occluded(tr: Triangles, o, d, t_limit):
    if tr.v0.shape[0] == 0:
        return jnp.zeros(o.shape[0], bool)
    p1 = tr.position + tr.v0
    p2 = tr.position + tr.v1
    p3 = tr.position + tr.v2
    e1 = (p2 - p1)[None, :, :]
    e2 = (p3 - p1)[None, :, :]
    dv = d[:, None, :]
    h = jnp.cross(dv, e2)
    a = dot3(e1, h)
    parallel = jnp.abs(a) < 1e-4
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = o[:, None, :] - p1[None, :, :]
    u = f * dot3(s, h)
    q = jnp.cross(s, e1)
    v = f * dot3(dv, q)
    t = f * dot3(e2, q)
    ok = ~parallel & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
    ok &= (t >= 1e-4) & (t <= t_limit[:, None])
    return jnp.any(ok, axis=1)
