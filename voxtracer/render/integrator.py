"""Wavefront integrators — the TPU rewrite of Renderer::Trace.

The reference shades with a recursive megafunction over scalar rays
(renderer.cpp:1076-1328).  Here the whole ray population advances together:
one `lax.scan` over bounce depth; per bounce every material lobe is computed
vectorized and masked (TPUs have no per-lane control flow — SURVEY.md §7
"hard parts").  Scene intersection is a `lax.scan` over volume instances
with the batched DDA kernels (kernels/dda.py), mirroring the reference's
linear TLAS loop (renderer.cpp:946-1018) but data-parallel over rays.

Modes:
  primary — flat albedo at first hit (BASELINE config 1)
  whitted — deterministic: NEE sum, perfect mirrors, Fresnel-split glass
  path    — full stochastic reference semantics (metals w/ roughness,
            Schlick diffuse/spec split, dielectric marching w/ Beer-Lambert,
            stochastic smoke scattering, emissives, sky)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from voxtracer.config import RenderConfig
from voxtracer.core import mathx
from voxtracer.core.sampling import (
    lambertian_dir,
    point_in_circle,
    positive_octant_dir,
    sphere_sample,
    uniform_hemisphere_dir,
)
from voxtracer.core.types import (
    EMISSIVE,
    GLASS,
    MAT_NONE,
    METAL_HIGH,
    METAL_LOW,
    SMOKE_LOW_DENSITY,
    SMOKE_PLAYER,
    SceneData,
)
from voxtracer.kernels import dda
from voxtracer.kernels.primitives import (
    spheres_nearest,
    spheres_occluded,
    triangles_nearest,
    triangles_occluded,
)
from voxtracer.render.sky import sample_sky

BIG = 1e34
F32 = jnp.float32


def _unit(v):
    n = jnp.sqrt((v * v).sum(-1, keepdims=True))
    return v / jnp.maximum(n, 1e-20)


def _transform_rays(inv, o_world, d_world):
    """World -> object space (reference: renderer.cpp:959-984)."""
    o = o_world @ inv[:3, :3].T + inv[:3, 3]
    d = d_world @ inv[:3, :3].T
    rd = 1.0 / d  # inf on zeros, as the reference (NaN quirks preserved)
    dsign = jnp.signbit(d).astype(F32)
    return o, d, rd, dsign


def _vol_args(scene: SceneData):
    v = scene.volumes
    return (v.grids.reshape(-1), v.gridsize, v.inv, v.fwd, v.cube_min)


def _brick_kwargs(scene: SceneData):
    v = scene.volumes
    return dict(bricks_flat=v.bricks.reshape(-1), bricksize=v.bricksize)


def find_nearest_world(scene: SceneData, o, d, active,
                       skip_lo=1, skip_hi=0, skip_first=False):
    """Renderer::FindNearest (renderer.cpp:946-1018) — all instances
    traversed in ONE fused wavefront loop (kernels/dda.py), then
    spheres/triangles merged.  Returns dict(t, mat, normal, vol, hit)."""
    n = o.shape[0]
    nvol = scene.volumes.n
    vol_enabled = jnp.ones(nvol, bool)
    if skip_first:
        vol_enabled = vol_enabled.at[0].set(False)
    res = dda.traverse(*_vol_args(scene), o, d, jnp.full(n, BIG, F32),
                       active, vol_enabled, jnp.int32(skip_lo),
                       jnp.int32(skip_hi), mode="nearest",
                       **_brick_kwargs(scene))
    carry = dict(
        t=res["t"],
        mat=jnp.where(res["hit"], res["cell"], MAT_NONE),
        normal=jnp.stack([res["nx"], res["ny"], res["nz"]], axis=-1),
        vol=res["vol"],
    )

    # spheres + triangles on a fresh ray then min-merge (renderer.cpp:996-1016)
    st, smat, snrm, sinside = spheres_nearest(scene.spheres, o, d)
    tt, tmat, tnrm = triangles_nearest(scene.triangles, o, d)
    prim_t = jnp.minimum(st, tt)
    use_tri = tt < st
    prim_mat = jnp.where(use_tri, tmat, smat)
    prim_nrm = jnp.where(use_tri[:, None], tnrm, snrm)
    prim_inside = jnp.where(use_tri, False, sinside)
    adopt = active & (carry["t"] > prim_t)
    out = dict(
        t=jnp.where(adopt, prim_t, carry["t"]),
        mat=jnp.where(adopt, prim_mat, carry["mat"]),
        normal=jnp.where(adopt[:, None], prim_nrm, carry["normal"]),
        vol=jnp.where(adopt, -1, carry["vol"]),
        # sphere hits REPLACE isInsideGlass on adoption (renderer.cpp:1013);
        # the flag comes from the closest sphere even if a triangle won
        # (triangles never write it, Shapes.h) — quirk preserved
        prim_adopt=adopt,
        prim_inside=prim_inside,
    )
    out["hit"] = active & (out["mat"] != MAT_NONE)
    return out


def is_occluded_world(scene: SceneData, o, d, t_limit, active):
    """Renderer::IsOccluded (renderer.cpp:209-243) — one fused pass."""
    res = dda.traverse(*_vol_args(scene), o, d, t_limit, active,
                       jnp.ones(scene.volumes.n, bool),
                       jnp.int32(1), jnp.int32(0), mode="occluded",
                       **_brick_kwargs(scene))
    occ = res["hit"]
    occ = occ | spheres_occluded(scene.spheres, o, d, t_limit)
    occ = occ | triangles_occluded(scene.triangles, o, d, t_limit)
    return occ


def material_exit_world(scene: SceneData, o, d, vol_idx, mode_code, mask):
    """Per-ray FindMaterialExit/FindSmokeExit through the ray's own volume
    (renderer.cpp:1160-1179, 1265-1280).  Returns (in_volume, t, normal)."""
    n = o.shape[0]
    res = dda.traverse(*_vol_args(scene), o, d, jnp.full(n, BIG, F32),
                       mask, jnp.ones(scene.volumes.n, bool),
                       jnp.int32(1), jnp.int32(0), mode="exit",
                       mode_code=mode_code, vol_match=vol_idx,
                       **_brick_kwargs(scene))
    normal = jnp.stack([res["nx"], res["ny"], res["nz"]], axis=-1)
    return res["in_vol"], res["t"], normal


# --------------------------------------------------------------------------
# Lighting (NEE) — renderer.cpp:102-207, 315-338, 738-764
# --------------------------------------------------------------------------

def _albedo(scene, mat):
    return jnp.take(scene.materials.albedo, mat, axis=0)


def _light_contribution(scene: SceneData, cfg: RenderConfig, p, nrm, alb,
                        kind: str, idx, active, key):
    """Evaluate one light (per-type formulas) for all rays; one shadow pass.
    kind selects the bank; idx is a per-ray index into it."""
    L = scene.lights
    if kind == "point":
        lpos = jnp.take(L.point_pos, idx, axis=0)
        lcol = jnp.take(L.point_color, idx, axis=0)
        to_l = lpos - p
        dst = jnp.sqrt((to_l * to_l).sum(-1))
        dirn = to_l / dst[:, None]
        cos_t = (dirn * nrm).sum(-1)
        gate = cos_t > 0.0
        intensity = cos_t[:, None] * lcol / (dst * dst)[:, None]
        shadow_t = dst
    elif kind == "spot":
        lpos = jnp.take(L.spot_pos, idx, axis=0)
        ldir = jnp.take(L.spot_dir, idx, axis=0)
        lcol = jnp.take(L.spot_color, idx, axis=0)
        lcos = jnp.take(L.spot_cos_angle, idx, axis=0)
        to_l = lpos - p
        dst = jnp.sqrt((to_l * to_l).sum(-1))
        dirn = to_l / dst[:, None]
        cos_t = (dirn * ldir).sum(-1)
        gate = cos_t > lcos
        alpha = 1.0 - (1.0 - cos_t) / (1.0 - lcos)
        intensity = cos_t[:, None] * lcol / (dst * dst)[:, None] * alpha[:, None]
        shadow_t = dst
    elif kind == "dir":
        dirn = jnp.broadcast_to(-L.dir_direction, p.shape)
        cos_t = (dirn * nrm).sum(-1)
        gate = cos_t > 0.0
        intensity = cos_t[:, None] * L.dir_color
        shadow_t = jnp.full(p.shape[0], BIG, F32)
    elif kind == "area":
        # handled by _area_contribution (multi-sample)
        raise AssertionError
    origin = mathx.offset_ray(p, nrm, jnp)
    need = active & gate
    occ = is_occluded_world(scene, origin, dirn, shadow_t, need)
    lit = need & ~occ
    return jnp.where(lit[:, None], intensity * alb, 0.0)


def _area_contribution(scene, cfg, p, nrm, alb, idx, active, key):
    """Sphere area light, numCheckShadowsAreaLight stochastic samples
    (renderer.cpp:161-207)."""
    L = scene.lights
    lpos = jnp.take(L.area_pos, idx, axis=0)
    lcol = jnp.take(L.area_color, idx, axis=0)
    lmul = jnp.take(L.area_mult, idx, axis=0)
    lrad = jnp.take(L.area_radius, idx, axis=0)
    origin = mathx.offset_ray(p, nrm, jnp)
    acc = jnp.zeros_like(p)
    for k in range(cfg.num_area_samples):
        gk = jax.random.normal(jax.random.fold_in(key, k), p.shape, F32)
        target = positive_octant_dir(gk, jnp) * lrad[:, None] + lpos
        to_l = target - p
        dst = jnp.sqrt((to_l * to_l).sum(-1))
        dirn = to_l / dst[:, None]
        cos_t = (dirn * nrm).sum(-1)
        need = active & (cos_t > 0.0)
        occ = is_occluded_world(scene, origin, dirn, dst, need)
        lit = need & ~occ
        contrib = (cos_t * lmul * lrad * lrad * (4.0 * jnp.pi) / (dst * dst))[:, None] * lcol
        acc = acc + jnp.where(lit[:, None], contrib, 0.0)
    return acc / cfg.num_area_samples * alb


def illumination(scene: SceneData, cfg: RenderConfig, p, nrm, mat, active, key):
    """Renderer::Illumination (renderer.cpp:738-764): one random light
    scaled by lightCount, or the deterministic all-lights sum (same
    expectation) when cfg.deterministic_lights."""
    L = scene.lights
    n_p, n_a, n_s = L.n_point, L.n_area, L.n_spot
    total = L.count
    alb = _albedo(scene, mat)

    if cfg.deterministic_lights:
        acc = jnp.zeros_like(p)
        for i in range(n_p):
            acc += _light_contribution(scene, cfg, p, nrm, alb, "point",
                                       jnp.full(p.shape[0], i, jnp.int32), active, key)
        for i in range(n_a):
            acc += _area_contribution(scene, cfg, p, nrm, alb,
                                      jnp.full(p.shape[0], i, jnp.int32), active,
                                      jax.random.fold_in(key, 1000 + i))
        for i in range(n_s):
            acc += _light_contribution(scene, cfg, p, nrm, alb, "spot",
                                       jnp.full(p.shape[0], i, jnp.int32), active, key)
        acc += _light_contribution(scene, cfg, p, nrm, alb, "dir",
                                   jnp.zeros(p.shape[0], jnp.int32), active, key)
        return acc

    u = jax.random.uniform(jax.random.fold_in(key, 7), (p.shape[0],), F32)
    idx = jnp.minimum((u * total).astype(jnp.int32), total - 1)
    acc = jnp.zeros_like(p)
    if n_p:
        sel = idx < n_p
        acc += jnp.where(sel[:, None], _light_contribution(
            scene, cfg, p, nrm, alb, "point",
            jnp.clip(idx, 0, n_p - 1), active & sel, key), 0.0)
    if n_a:
        sel = (idx >= n_p) & (idx < n_p + n_a)
        acc += jnp.where(sel[:, None], _area_contribution(
            scene, cfg, p, nrm, alb, jnp.clip(idx - n_p, 0, n_a - 1),
            active & sel, jax.random.fold_in(key, 11)), 0.0)
    if n_s:
        sel = (idx >= n_p + n_a) & (idx < n_p + n_a + n_s)
        acc += jnp.where(sel[:, None], _light_contribution(
            scene, cfg, p, nrm, alb, "spot",
            jnp.clip(idx - n_p - n_a, 0, n_s - 1), active & sel, key), 0.0)
    sel = idx >= n_p + n_a + n_s
    acc += jnp.where(sel[:, None], _light_contribution(
        scene, cfg, p, nrm, alb, "dir",
        jnp.zeros(p.shape[0], jnp.int32), active & sel, key), 0.0)
    return acc * total


# --------------------------------------------------------------------------
# Path integrator (wavefront) — renderer.cpp:1076-1328 flattened
# --------------------------------------------------------------------------

def trace_path(scene: SceneData, cfg: RenderConfig, o, d, key):
    """Full stochastic light transport; returns radiance [N, 3]."""
    n = o.shape[0]
    state = dict(
        o=o, d=d,
        throughput=jnp.ones((n, 3), F32),
        radiance=jnp.zeros((n, 3), F32),
        in_glass=jnp.zeros(n, bool),
        active=jnp.ones(n, bool),
    )

    def bounce(state, depth):
        bkey = jax.random.fold_in(key, depth)
        o, d, active = state["o"], state["d"], state["active"]
        hitrec = find_nearest_world(scene, o, d, active)
        t, mat, nrm, vol = hitrec["t"], hitrec["mat"], hitrec["normal"], hitrec["vol"]
        in_glass = jnp.where(hitrec["prim_adopt"], hitrec["prim_inside"],
                             state["in_glass"])

        # miss -> sky, terminate (renderer.cpp:1092-1095)
        miss = active & (mat == MAT_NONE)
        sky = sample_sky(scene.sky, d, cfg.activate_sky, cfg.sky_fallback)
        radiance = state["radiance"] + jnp.where(
            miss[:, None], state["throughput"] * sky, 0.0)
        active = active & ~miss

        alb = _albedo(scene, mat)
        rough = jnp.take(scene.materials.roughness, mat)
        emis = jnp.take(scene.materials.emissive, mat)
        ior = jnp.take(scene.materials.ior, mat)

        is_metal = (mat >= METAL_HIGH) & (mat <= METAL_LOW)
        is_nonmetal = mat < METAL_HIGH
        is_glass_m = mat == GLASS
        is_smoke = (mat >= SMOKE_LOW_DENSITY) & (mat <= SMOKE_PLAYER)
        is_emissive = mat == EMISSIVE
        is_model = (mat > EMISSIVE) & (mat != MAT_NONE)

        p_hit = o + t[:, None] * d

        # ---- emissive: terminal (renderer.cpp:1315-1316)
        emis_mask = active & is_emissive
        radiance = radiance + jnp.where(
            emis_mask[:, None], state["throughput"] * alb * emis[:, None], 0.0)

        # ---- dielectric / smoke medium march (glass & smoke share it)
        march = active & in_glass & (is_glass_m | is_smoke) & (vol >= 0)
        mode_code = jnp.where(is_glass_m, dda.EXIT_GLASS, dda.EXIT_SMOKE)
        in_vol, t_exit, nrm_exit = material_exit_world(
            scene, o, d, vol, mode_code, march)
        # marched rays: t := exit t; normal := exit normal if still inside
        t = jnp.where(march, t_exit, t)
        nrm = jnp.where((march & in_vol)[:, None], nrm_exit, nrm)
        # fell off the grid: move origin to boundary, t=0 (renderer.cpp:1175-1179)
        fell = march & ~in_vol
        o = jnp.where(fell[:, None], o + t[:, None] * d, o)
        t = jnp.where(fell, 0.0, t)
        p_hit = o + t[:, None] * d

        # ---- NEE for diffuse-ish lobes
        u_lobe = jax.random.uniform(jax.random.fold_in(bkey, 1), (n,), F32)
        cos_in = jnp.clip((-d * nrm).sum(-1), a_max=1.0)
        go_diffuse = u_lobe > mathx.schlick_nonmetal(cos_in)
        nee_mask = active & ((is_nonmetal & go_diffuse) | is_model)
        inc = illumination(scene, cfg, p_hit, nrm, mat, nee_mask,
                           jax.random.fold_in(bkey, 2))
        # nonmetal: radiance += T * inc ; model: radiance += T * alb * inc
        radiance = radiance + jnp.where(
            (nee_mask & is_nonmetal)[:, None], state["throughput"] * inc, 0.0)
        radiance = radiance + jnp.where(
            (nee_mask & is_model)[:, None], state["throughput"] * alb * inc, 0.0)

        # ---- continuation directions per lobe
        u_sph = jax.random.uniform(jax.random.fold_in(bkey, 3), (n, 3), F32)
        g_hemi = jax.random.normal(jax.random.fold_in(bkey, 4), (n, 3), F32)
        refl = mathx.reflect(d, nrm)
        spec_dir = refl + rough[:, None] * sphere_sample(u_sph, jnp)
        diff_dir = lambertian_dir(nrm, u_sph, jnp)
        model_dir = uniform_hemisphere_dir(nrm, g_hemi, jnp)

        # glass: Fresnel reflect-or-refract (renderer.cpp:1181-1208)
        ratio = jnp.where(in_glass, ior, 1.0 / ior)
        cos_g = jnp.minimum((-d * nrm).sum(-1), 1.0)
        sin_g = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_g * cos_g))
        cannot_refract = ratio * sin_g > 1.0
        u_fresnel = jax.random.uniform(jax.random.fold_in(bkey, 5), (n,), F32)
        do_reflect = cannot_refract | (mathx.schlick(cos_g, ratio, jnp) > u_fresnel)
        refr_dir = mathx.refract(d, nrm, ratio, jnp)
        glass_dir = jnp.where(do_reflect[:, None], refl, refr_dir)
        glass_norm = jnp.where(do_reflect[:, None], nrm, -nrm)
        glass_flip = active & is_glass_m & ~do_reflect

        # smoke: stochastic in-scatter (renderer.cpp:1282-1289), then the
        # unconditional ratio-1 "refraction" pass-through
        intensity = jnp.where(in_glass & is_smoke, emis, 0.0)
        dist = jnp.where(march, t, 0.0)
        u_s = jax.random.uniform(jax.random.fold_in(bkey, 6), (n, 2), F32)
        g_oct = jax.random.normal(jax.random.fold_in(bkey, 8), (n, 3), F32)
        thresh = u_s[:, 0] * 100.0 - intensity
        scatter = active & is_smoke & (u_s[:, 1] * dist > thresh)
        scat_t = t * 0.45 + u_s[:, 0] * (t - t * 0.45)  # Rand(t*.45, t)
        o = jnp.where(scatter[:, None], o + d * scat_t[:, None], o)
        d_sc = positive_octant_dir(g_oct, jnp)
        d = jnp.where(scatter[:, None], d_sc, d)
        t = jnp.where(scatter, 0.0, t)
        p_hit = o + t[:, None] * d
        smoke_trans = mathx.absorption(_albedo(scene, mat), intensity, dist, jnp)
        # NOTE: the ratio-1 refract leaves direction unchanged, so the smoke
        # continuation is just d with origin offset along -normal.

        # ---- select continuation
        new_d = jnp.where(is_metal[:, None], spec_dir, d)
        new_d = jnp.where((is_nonmetal & go_diffuse)[:, None], diff_dir, new_d)
        new_d = jnp.where((is_nonmetal & ~go_diffuse)[:, None], spec_dir, new_d)
        new_d = jnp.where(is_glass_m[:, None], glass_dir, new_d)
        new_d = jnp.where(is_model[:, None], model_dir, new_d)
        new_d = _unit(new_d)

        off_n = nrm
        off_n = jnp.where(is_glass_m[:, None], glass_norm, off_n)
        off_n = jnp.where(is_smoke[:, None], -nrm, off_n)
        new_o = mathx.offset_ray(p_hit, off_n, jnp)

        # ---- throughput updates
        tp = state["throughput"]
        tp = jnp.where((active & is_metal)[:, None], tp * alb, tp)
        tp = jnp.where((active & is_nonmetal & go_diffuse)[:, None], tp * alb, tp)
        glass_color = jnp.where(in_glass[:, None], alb, 1.0)
        tp = jnp.where((active & is_glass_m)[:, None], tp * glass_color, tp)
        tp = jnp.where((active & is_smoke)[:, None], tp * smoke_trans, tp)
        tp = jnp.where((active & is_model)[:, None], tp * alb, tp)

        new_in_glass = in_glass
        new_in_glass = jnp.where(glass_flip | (active & is_smoke),
                                 ~in_glass, new_in_glass)

        new_active = active & ~is_emissive

        return dict(
            o=jnp.where(new_active[:, None], new_o, o),
            d=jnp.where(new_active[:, None], new_d, d),
            throughput=tp,
            radiance=radiance,
            in_glass=new_in_glass,
            active=new_active,
        ), None

    # depth loop with early exit: the reference recursion simply stops when
    # rays terminate; a fixed scan would pay every bounce for a dead
    # wavefront (Trace depth semantics: maxBounces+1 segments,
    # renderer.cpp:1076-1083)
    def cond(carry):
        st, depth = carry
        return (depth < cfg.max_bounces + 1) & jnp.any(st["active"])

    def step(carry):
        st, depth = carry
        st, _ = bounce(st, depth)
        return st, depth + 1

    state, _ = jax.lax.while_loop(cond, step, (state, jnp.int32(0)))
    return state["radiance"]


# --------------------------------------------------------------------------
# Deterministic Whitted integrator (recursive, Fresnel-split)
# --------------------------------------------------------------------------

def trace_whitted(scene: SceneData, cfg: RenderConfig, o, d, depth: int,
                  in_glass=None, active=None):
    n = o.shape[0]
    if in_glass is None:
        in_glass = jnp.zeros(n, bool)
    if active is None:
        active = jnp.ones(n, bool)
    if depth < 0:
        return jnp.zeros((n, 3), F32)

    hitrec = find_nearest_world(scene, o, d, active)
    t, mat, nrm, vol = hitrec["t"], hitrec["mat"], hitrec["normal"], hitrec["vol"]
    in_glass = jnp.where(hitrec["prim_adopt"], hitrec["prim_inside"], in_glass)
    sky = sample_sky(scene.sky, d, cfg.activate_sky, cfg.sky_fallback)
    miss = active & (mat == MAT_NONE)
    color = jnp.where(miss[:, None], sky, 0.0)

    alb = _albedo(scene, mat)
    emis = jnp.take(scene.materials.emissive, mat)
    ior = jnp.take(scene.materials.ior, mat)

    is_metal = (mat >= METAL_HIGH) & (mat <= METAL_LOW)
    is_glass_m = mat == GLASS
    is_smoke = (mat >= SMOKE_LOW_DENSITY) & (mat <= SMOKE_PLAYER)
    is_emissive = mat == EMISSIVE
    is_diffuse = (mat < METAL_HIGH) | ((mat > EMISSIVE) & (mat != MAT_NONE))

    # medium march for glass/smoke entered rays
    march = active & in_glass & (is_glass_m | is_smoke) & (vol >= 0)
    mode_code = jnp.where(is_glass_m, dda.EXIT_GLASS, dda.EXIT_SMOKE)
    in_vol, t_exit, nrm_exit = material_exit_world(scene, o, d, vol, mode_code, march)
    t = jnp.where(march, t_exit, t)
    nrm = jnp.where((march & in_vol)[:, None], nrm_exit, nrm)
    fell = march & ~in_vol
    o = jnp.where(fell[:, None], o + t[:, None] * d, o)
    t = jnp.where(fell, 0.0, t)
    p_hit = o + t[:, None] * d

    # emissive terminal
    color = color + jnp.where((active & is_emissive)[:, None],
                              alb * emis[:, None], 0.0)

    # diffuse: deterministic NEE sum only
    nee_mask = active & is_diffuse
    inc = illumination(scene, cfg, p_hit, nrm, mat, nee_mask, jax.random.PRNGKey(0))
    is_model = (mat > EMISSIVE) & (mat != MAT_NONE)
    color = color + jnp.where((nee_mask & ~is_model)[:, None], inc, 0.0)
    color = color + jnp.where((nee_mask & is_model)[:, None], inc * alb, 0.0)

    if depth == 0:
        return color

    # metal: perfect mirror
    refl = mathx.reflect(d, nrm)
    metal_mask = active & is_metal
    if True:
        mo = mathx.offset_ray(p_hit, nrm, jnp)
        sub = trace_whitted(scene, cfg, mo, _unit(refl), depth - 1,
                            jnp.zeros(n, bool), metal_mask)
        color = color + jnp.where(metal_mask[:, None], sub * alb, 0.0)

    # glass: deterministic Fresnel split + smoke pass-through
    glass_mask = active & is_glass_m
    smoke_mask = active & is_smoke
    media_mask = glass_mask | smoke_mask
    ratio = jnp.where(in_glass, ior, 1.0 / ior)
    ratio = jnp.where(is_smoke, 1.0, ratio)
    cos_g = jnp.minimum((-d * nrm).sum(-1), 1.0)
    sin_g = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_g * cos_g))
    cannot_refract = (ratio * sin_g > 1.0) & glass_mask
    r_coef = jnp.where(cannot_refract, 1.0, mathx.schlick(cos_g, ratio, jnp))
    r_coef = jnp.where(smoke_mask, 0.0, r_coef)  # smoke never reflects
    glass_color = jnp.where(in_glass[:, None], alb, jnp.ones((n, 3), F32))
    intensity = jnp.where(in_glass & is_smoke, emis, 0.0)
    dist = jnp.where(march, t, 0.0)
    smoke_trans = mathx.absorption(alb, intensity, dist, jnp)
    media_color = jnp.where(smoke_mask[:, None], smoke_trans, glass_color)

    if cfg.whitted_glass_split:
        # reflected branch (glass only, weight r)
        need_refl = glass_mask & (r_coef > 0.0)
        ro = mathx.offset_ray(p_hit, nrm, jnp)
        sub_r = trace_whitted(scene, cfg, ro, _unit(refl), depth - 1,
                              in_glass, need_refl)
        color = color + jnp.where(need_refl[:, None],
                                  sub_r * media_color * r_coef[:, None], 0.0)
        # refracted branch (weight 1-r); smoke passes straight through
        refr_dir = mathx.refract(d, nrm, ratio, jnp)
        refr_dir = jnp.where(smoke_mask[:, None], d, refr_dir)
        need_refr = media_mask & (r_coef < 1.0)
        fo = mathx.offset_ray(p_hit, -nrm, jnp)
        sub_t = trace_whitted(scene, cfg, fo, _unit(refr_dir), depth - 1,
                              jnp.where(media_mask, ~in_glass, in_glass),
                              need_refr)
        color = color + jnp.where(need_refr[:, None],
                                  sub_t * media_color * (1.0 - r_coef[:, None]), 0.0)
    return color


# --------------------------------------------------------------------------
# Top-level rendering
# --------------------------------------------------------------------------

def _pixel_grid(cfg: RenderConfig):
    x = jnp.arange(cfg.width, dtype=F32)
    y = jnp.arange(cfg.height, dtype=F32)
    px, py = jnp.meshgrid(x, y)  # [H, W]
    return px.reshape(-1), py.reshape(-1)


def _sample_pixels(scene: SceneData, cfg: RenderConfig, key, px, py):
    """One sample for the given pixel coordinates -> radiance [N, 3]."""
    from voxtracer.render.camera import primary_rays

    n = px.shape[0]
    deterministic = cfg.mode in ("primary", "whitted")
    if not deterministic:
        u = jax.random.uniform(jax.random.fold_in(key, 100), (n, 2), F32)
        px = px + u[:, 0] * cfg.aa_strength
        py = py + u[:, 1] * cfg.aa_strength
    lens = (jax.random.uniform(jax.random.fold_in(key, 101), (n, 2), F32)
            if (cfg.use_dof and not deterministic) else None)
    o, d = primary_rays(scene.camera, cfg.width, cfg.height, px, py, lens, jnp)

    if cfg.mode == "primary":
        rec = find_nearest_world(scene, o, d, jnp.ones(n, bool))
        sky = sample_sky(scene.sky, d, cfg.activate_sky, cfg.sky_fallback)
        return jnp.where(rec["hit"][:, None], _albedo(scene, rec["mat"]), sky)
    if cfg.mode == "whitted":
        return trace_whitted(scene, cfg, o, d, cfg.max_bounces)
    return trace_path(scene, cfg, o, d, key)


def render_sample(scene: SceneData, cfg: RenderConfig, key):
    """One sample per pixel -> radiance [H*W, 3]."""
    px, py = _pixel_grid(cfg)
    return _sample_pixels(scene, cfg, key, px, py)


@partial(jax.jit, static_argnames=("cfg", "spp"))
def render(scene: SceneData, cfg: RenderConfig, key, spp: int = 1):
    """Average spp samples -> [H, W, 3] radiance image."""
    def body(acc, i):
        return acc + render_sample(scene, cfg, jax.random.fold_in(key, i)), None

    acc, _ = jax.lax.scan(body, jnp.zeros((cfg.width * cfg.height, 3), F32),
                          jnp.arange(spp))
    return (acc / spp).reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnames=("cfg", "spp", "rows"))
def _render_band(scene: SceneData, cfg: RenderConfig, key, row0, rows: int,
                 spp: int):
    """spp-averaged radiance for `rows` scanlines starting at traced row0."""
    x = jnp.arange(cfg.width, dtype=F32)
    y = jnp.arange(rows, dtype=F32) + row0
    px, py = jnp.meshgrid(x, y)
    px, py = px.reshape(-1), py.reshape(-1)

    def body(acc, i):
        k = jax.random.fold_in(jax.random.fold_in(key, i), row0)
        return acc + _sample_pixels(scene, cfg, k, px, py), None

    acc, _ = jax.lax.scan(body, jnp.zeros((rows * cfg.width, 3), F32),
                          jnp.arange(spp))
    return acc / spp


def render_tiled(scene: SceneData, cfg: RenderConfig, key, spp: int = 1,
                 tiles: int = 8):
    """Render in row bands to bound peak memory — the [V, N_band] traversal
    state of a full 1080p wavefront exceeds the chip's HBM (the reference's
    scanline partitioning, renderer.cpp:1662, reborn as a memory tool).
    One compile serves all bands (row0 is a traced scalar)."""
    import numpy as np

    h, w = cfg.height, cfg.width
    rows = -(-h // tiles)
    out = np.zeros((h, w, 3), np.float32)
    for b in range(tiles):
        row0 = min(b * rows, h - rows)
        band = np.asarray(_render_band(scene, cfg, key, jnp.float32(row0),
                                       rows, spp))
        out[row0:row0 + rows] = band.reshape(rows, w, 3)
    return out
