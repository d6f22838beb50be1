"""Stochastic direction samplers, distribution-matched to the reference.

Each sampler consumes *pre-drawn* uniforms/gaussians so the NumPy oracle and
the JAX integrator share one formula (see core/mathx.py docstring).  Where
the reference rejection-samples, we substitute a rejection-free sampler with
the *identical distribution* (noted per function) — converged images match;
per-sample sequences do not (SURVEY.md §7 "RNG parity").
"""

from __future__ import annotations

import numpy as np

from voxtracer.core.mathx import dot3, normalize

TWO_PI = 2.0 * np.pi


def sphere_sample(u, xp):
    """Reference RandomSphereSample (tmpl8math.h:2502-2511) — intentionally
    non-uniform (spherical-coordinate, random radius).  Exact formula.

    u: [..., 3] uniforms in [0,1)."""
    theta = u[..., 0] * TWO_PI
    phi = u[..., 1] * np.pi
    r = u[..., 2]
    sp = xp.sin(phi)
    return xp.stack([r * sp * xp.cos(theta), r * sp * xp.sin(theta), r * xp.cos(phi)], axis=-1)


def lambertian_dir(normal, u, xp):
    """Reference RandomLambertianReflectionVector = N + RandomSphereSample()
    (tmpl8math.h:2513-2516).  NOT normalized here; callers construct rays
    whose constructor normalizes (scene.cpp:85-97)."""
    return normal + sphere_sample(u, xp)


def positive_octant_dir(gauss, xp):
    """Reference RandomDirection (tmpl8math.cpp:76-93): rejection sampling a
    *positive-octant* unit vector (documented quirk, SURVEY.md §7).
    Equivalent rejection-free form: |gaussian| normalized — an isotropic
    gaussian folded into the octant is uniform on the octant sphere patch.

    gauss: [..., 3] standard normals."""
    return normalize(xp.abs(gauss) + 1e-12, xp)


def uniform_hemisphere_dir(normal, gauss, xp):
    """Reference DiffuseReflection (tmpl8math.h:2517-2527): uniform sphere
    direction sign-flipped into the normal's hemisphere.  Gaussian-normalize
    gives the same uniform sphere distribution without rejection."""
    d = normalize(gauss + 1e-12, xp)
    flip = xp.where(dot3(d, normal) < 0.0, -1.0, 1.0)
    return d * flip[..., None]


def point_in_circle(u, xp):
    """Reference RandomPointInCircle (tmpl8math.cpp:119-124): exact formula.

    u: [..., 2] uniforms -> [..., 2] disk points."""
    r = xp.sqrt(u[..., 0])
    theta = TWO_PI * u[..., 1]
    return xp.stack([r * xp.cos(theta), r * xp.sin(theta)], axis=-1)
