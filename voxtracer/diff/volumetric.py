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

    # SoA component layout throughout the march (PERF_NOTES.md: trailing
    # dim 3 wastes the VPU) + fused per-step gather over all volumes.
    inv = scene.volumes.inv  # [V, 4, 4]

    def tr(row, px_, py_, pz_, point):
        c = row[:, None, :]
        out = c[..., 0] * px_ + c[..., 1] * py_ + c[..., 2] * pz_
        return out + c[..., 3] if point else out

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    vox = tr(inv[:, 0], ox, oy, oz, True)   # [V, N]
    voy = tr(inv[:, 1], ox, oy, oz, True)
    voz = tr(inv[:, 2], ox, oy, oz, True)
    vdx = tr(inv[:, 0], dx, dy, dz, False)
    vdy = tr(inv[:, 1], dx, dy, dz, False)
    vdz = tr(inv[:, 2], dx, dy, dz, False)

    cb = scene.volumes.cube_min  # [V, 3]
    bx, by, bz = cb[:, 0][:, None], cb[:, 1][:, None], cb[:, 2][:, None]

    def slab(b0, oc, dc):
        rd = 1.0 / dc
        a = (b0 - oc) * rd
        b = (b0 + 1.0 - oc) * rd
        return jnp.minimum(a, b), jnp.maximum(a, b)

    t0x, t1x = slab(bx, vox, vdx)
    t0y, t1y = slab(by, voy, vdy)
    t0z, t1z = slab(bz, voz, vdz)
    t0 = jnp.maximum(jnp.maximum(t0x, t0y), jnp.maximum(t0z, 0.0))
    t1 = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
    hit = t1 > t0

    t_near = jnp.where(hit, t0, jnp.inf).min(axis=0)  # [N]
    t_far = jnp.where(hit, t1, -jnp.inf).max(axis=0)
    valid = jnp.isfinite(t_near) & (t_far > t_near)
    t_near = jnp.where(valid, t_near, 0.0)
    t_far = jnp.where(valid, t_far, 1.0)
    dt = (t_far - t_near) / n_steps  # [N]

    gs_f = scene.volumes.gridsize.astype(F32)[:, None]  # [V, 1]
    gs_i = scene.volumes.gridsize[:, None]
    dens_flat = (jax.nn.softplus(params.density_logits).reshape(-1)
                 * density_scale)  # [V * G^3]
    mats_flat = scene.volumes.grids.reshape(-1)
    vol_base = (jnp.arange(v, dtype=jnp.int32) * g * g * g)[:, None]
    alb_t = params.albedo_table.T  # [3, 256]

    def step(carry, k):
        trans, cr, cg_, cb_ = carry
        t_mid = (t_near + (k + 0.5) * dt)[None, :]  # [1, N]
        lx = (vox + t_mid * vdx - bx) * gs_f
        ly = (voy + t_mid * vdy - by) * gs_f
        lz = (voz + t_mid * vdz - bz) * gs_f
        ix = jnp.clip(lx.astype(jnp.int32), 0, gs_i - 1)
        iy = jnp.clip(ly.astype(jnp.int32), 0, gs_i - 1)
        iz = jnp.clip(lz.astype(jnp.int32), 0, gs_i - 1)
        inside = ((lx >= 0.0) & (lx < gs_f) & (ly >= 0.0) & (ly < gs_f)
                  & (lz >= 0.0) & (lz < gs_f))
        flat = (ix * g + iy) * g + iz + vol_base
        s = jnp.where(inside, jnp.take(dens_flat, flat, mode="clip"), 0.0)
        m = jnp.take(mats_flat, flat, mode="clip")  # [V, N]
        sigma = s.sum(axis=0)  # [N]
        # per-channel weighted albedo (gathers stay [V, N])
        ar = jnp.take(alb_t[0], m, mode="clip")
        ag = jnp.take(alb_t[1], m, mode="clip")
        ab = jnp.take(alb_t[2], m, mode="clip")
        wr = (s * ar).sum(axis=0)
        wg = (s * ag).sum(axis=0)
        wb = (s * ab).sum(axis=0)
        alpha = 1.0 - jnp.exp(-sigma * dt)
        inv_sigma = 1.0 / jnp.maximum(sigma, 1e-8)
        wgt = trans * alpha * inv_sigma
        cr = cr + wgt * wr
        cg_ = cg_ + wgt * wg
        cb_ = cb_ + wgt * wb
        trans = trans * (1.0 - alpha)
        return (trans, cr, cg_, cb_), None

    init = (jnp.ones(n, F32), jnp.zeros(n, F32), jnp.zeros(n, F32),
            jnp.zeros(n, F32))
    (trans, cr, cg_, cb_), _ = jax.lax.scan(
        jax.checkpoint(step), init, jnp.arange(n_steps, dtype=F32))
    color = jnp.stack([cr, cg_, cb_], axis=-1)

    bg = sample_sky(scene.sky, d, cfg.activate_sky, cfg.sky_fallback)
    img = color + trans[:, None] * bg
    img = jnp.where(valid[:, None], img, bg)
    return img.reshape(rows or cfg.height, cfg.width, 3)


def mse_loss(params: DiffParams, scene: SceneData, cfg, target, key,
             n_steps: int = 192, row0=None, rows: int = 0):
    img = render_diff(params, scene, cfg, key, n_steps, row0=row0, rows=rows)
    return jnp.mean((img - target) ** 2)


grad_fn = jax.jit(jax.grad(mse_loss), static_argnames=("cfg", "n_steps", "rows"))
