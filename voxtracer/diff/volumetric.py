"""Differentiable (relaxed) voxel rendering — the adjoint-capable twin of the
hard DDA renderer.

The hard forward (kernels/dda.py) is piecewise-constant in voxel occupancy:
first-hit geometry has zero/undefined gradients (SURVEY.md §7 "adjoint of a
discrete traversal").  This module renders the SAME voxel worlds through an
exp-transmittance ray march:

    T_k = exp(-sum_{j<k} sigma_j dt),  C = sum_k T_k (1-exp(-sigma_k dt)) c_k
          + T_final * background

with sigma = softplus(density_logits) * scale.  As scale -> inf and logits
saturate, C converges to the hard primary-hit image — golden tests check
that consistency.  Gradients flow to per-voxel density logits AND the
256-entry material albedo table (the differentiable parameter set of
BASELINE.json).

The bounce/shading path of the hard renderer is separately differentiable
w.r.t. material parameters (traversal outputs are stop_gradient'ed there);
this module supplies the geometry gradients the reference never had.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from voxtracer.core.types import MAT_NONE, SceneData
from voxtracer.render.sky import sample_sky

F32 = jnp.float32


@struct.dataclass
class DiffParams:
    """The trainable leaves."""

    density_logits: jnp.ndarray  # [V, G, G, G] f32
    albedo_table: jnp.ndarray  # [256, 3] f32


def params_from_scene(scene: SceneData, occupied_logit=6.0, empty_logit=-6.0) -> DiffParams:
    occ = scene.volumes.grids != MAT_NONE
    logits = jnp.where(occ, occupied_logit, empty_logit).astype(F32)
    return DiffParams(density_logits=logits,
                      albedo_table=jnp.asarray(scene.materials.albedo, F32))


def _ray_aabb(cube_min, o, d):
    """Entry/exit of the object-space unit cube; (t0, t1) with t0<t1 if hit."""
    rd = 1.0 / d
    a = (cube_min - o) * rd
    b = (cube_min + 1.0 - o) * rd
    tmin = jnp.minimum(a, b).max(axis=-1)
    tmax = jnp.maximum(a, b).min(axis=-1)
    t0 = jnp.maximum(tmin, 0.0)
    return t0, tmax, tmax > t0


@partial(jax.jit, static_argnames=("n_steps", "cfg", "rows"))
def render_diff(params: DiffParams, scene: SceneData, cfg, key, n_steps: int = 192,
                density_scale: float = 512.0, row0=None, rows: int = 0):
    """Primary-visibility differentiable render -> [H, W, 3] (or
    [rows, W, 3] when a row band is given — used to bound memory at 1080p).

    Marches all volumes jointly in world-t order with fixed global steps
    between the union of entry/exit ranges (handles overlaps without
    sorting — densities add, albedos blend by weight)."""
    from voxtracer.render.camera import primary_rays
    from voxtracer.render.integrator import _pixel_grid

    if rows:
        x = jnp.arange(cfg.width, dtype=F32)
        y = jnp.arange(rows, dtype=F32) + row0
        px, py = jnp.meshgrid(x, y)
        px, py = px.reshape(-1), py.reshape(-1)
    else:
        px, py = _pixel_grid(cfg)
    o, d = primary_rays(scene.camera, cfg.width, cfg.height, px, py, None, jnp)
    n = o.shape[0]
    v = scene.volumes.n
    g = scene.volumes.pad_size

    # per-volume object-space rays + entry/exit
    inv = scene.volumes.inv  # [V, 4, 4]
    oo = jnp.einsum("vij,nj->vni", inv[:, :3, :3], o) + inv[:, None, :3, 3]
    od = jnp.einsum("vij,nj->vni", inv[:, :3, :3], d)
    t0, t1, hit = jax.vmap(_ray_aabb)(scene.volumes.cube_min, oo, od)  # [V, N]

    t_near = jnp.where(hit, t0, jnp.inf).min(axis=0)  # [N]
    t_far = jnp.where(hit, t1, -jnp.inf).max(axis=0)
    valid = jnp.isfinite(t_near) & (t_far > t_near)
    t_near = jnp.where(valid, t_near, 0.0)
    t_far = jnp.where(valid, t_far, 1.0)
    dt = (t_far - t_near) / n_steps  # [N]

    gridsize = scene.volumes.gridsize.astype(F32)  # [V]
    dens_flat = jax.nn.softplus(params.density_logits).reshape(v, -1) * density_scale
    mats_flat = scene.volumes.grids.reshape(v, -1)

    def step(carry, k):
        trans, color = carry
        t_mid = t_near + (k + 0.5) * dt  # [N]
        sigma = jnp.zeros(n, F32)
        csum = jnp.zeros((n, 3), F32)
        for vi in range(v):  # static loop over instances
            p = oo[vi] + t_mid[:, None] * od[vi]  # object space
            local = (p - scene.volumes.cube_min[vi]) * gridsize[vi]
            idx = jnp.clip(local.astype(jnp.int32), 0,
                           scene.volumes.gridsize[vi] - 1)
            inside = ((local >= 0.0) & (local < gridsize[vi])).all(axis=-1)
            flat = (idx[:, 0] * g + idx[:, 1]) * g + idx[:, 2]
            s = jnp.where(inside, jnp.take(dens_flat[vi], flat), 0.0)
            m = jnp.take(mats_flat[vi], flat)
            c = jnp.take(params.albedo_table, m, axis=0)
            sigma = sigma + s
            csum = csum + s[:, None] * c
        alpha = 1.0 - jnp.exp(-sigma * dt)
        c_blend = csum / jnp.maximum(sigma, 1e-8)[:, None]
        color = color + (trans * alpha)[:, None] * c_blend
        trans = trans * (1.0 - alpha)
        return (trans, color), None

    init = (jnp.ones(n, F32), jnp.zeros((n, 3), F32))
    (trans, color), _ = jax.lax.scan(
        jax.checkpoint(step), init, jnp.arange(n_steps, dtype=F32))

    bg = sample_sky(scene.sky, d, cfg.activate_sky, cfg.sky_fallback)
    img = color + trans[:, None] * bg
    img = jnp.where(valid[:, None], img, bg)
    return img.reshape(rows or cfg.height, cfg.width, 3)


def mse_loss(params: DiffParams, scene: SceneData, cfg, target, key,
             n_steps: int = 192, row0=None, rows: int = 0):
    img = render_diff(params, scene, cfg, key, n_steps, row0=row0, rows=rows)
    return jnp.mean((img - target) ** 2)


grad_fn = jax.jit(jax.grad(mse_loss), static_argnames=("cfg", "n_steps", "rows"))
