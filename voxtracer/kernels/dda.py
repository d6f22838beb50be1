"""Wavefront 3D-DDA (Amanatides–Woo) traversal — batched, masked, jittable.

TPU-native redesign of the reference's scalar per-ray DDA loops
(Scene::FindNearest / FindNearestExcept / FindMaterialExit / FindSmokeExit /
IsOccluded, scene.cpp:719-1047): the whole ray wavefront steps one volume
together under a `lax.while_loop` with per-lane active masks; the grid is a
flat int32 array fetched with vector gathers.  No per-ray control flow, no
recursion — XLA sees a single fused loop body.

Semantics parity notes:
 * Axis selection replicates the reference's nested branches *including*
   their NaN behavior (0 * inf products for axis-parallel rays make that
   axis lose / poison comparisons the same way, scene.cpp:773-801).
 * `t` bookkeeping follows FindNearest ordering: t is updated to the
   crossing BEFORE the bounds check, so boundary exits report the boundary
   crossing t (needed by FindMaterialExit, scene.cpp:929).
 * Traversal outputs are wrapped in stop_gradient — geometry is discrete;
   differentiability comes from the relaxed integrator in diff/.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from voxtracer.core.types import MAT_NONE

BIG = 1e34

# leave-predicate codes for exit marches
EXIT_GLASS = 0  # leave when cell != GLASS        (FindMaterialExit)
EXIT_SMOKE = 1  # leave when cell outside smoke   (FindSmokeExit)


def cube_intersect(cube_min, o, d, rd):
    """Batched slab test (Cube::Intersect, scene.cpp:166-202).
    cube is the object-space unit cube [cube_min, cube_min+1].
    Returns entry t, BIG on miss (also when origin is past the cube)."""
    b0 = cube_min
    b1 = cube_min + 1.0
    neg = d < 0.0
    lo = jnp.where(neg, b1, b0)
    hi = jnp.where(neg, b0, b1)
    tmin = (lo - o) * rd
    tmax = (hi - o) * rd
    miss_xy = (tmin[..., 0] > tmax[..., 1]) | (tmin[..., 1] > tmax[..., 0])
    t0 = jnp.maximum(tmin[..., 0], tmin[..., 1])
    t1 = jnp.minimum(tmax[..., 0], tmax[..., 1])
    miss_z = (t0 > tmax[..., 2]) | (tmin[..., 2] > t1)
    t0 = jnp.maximum(t0, tmin[..., 2])
    return jnp.where(miss_xy | miss_z | (t0 <= 0.0), BIG, t0)


def setup_dda(cube_min, gridsize, o, d, rd, dsign):
    """Batched Setup3DDDA (scene.cpp:719-749).

    Returns (valid, entry_t, P [N,3] i32, step [N,3] i32, tdelta, tmax)."""
    inside = jnp.all((o >= cube_min) & (o <= cube_min + 1.0), axis=-1)
    t_entry = jnp.where(inside, 0.0, cube_intersect(cube_min, o, d, rd))
    valid = t_entry < 1e33

    gf = gridsize.astype(jnp.float32)
    cell = 1.0 / gf
    step = (1 - dsign * 2).astype(jnp.int32)
    pos_in_grid = gf * ((o - cube_min) + (t_entry[..., None] + 5e-5) * d)
    grid_planes = (jnp.ceil(pos_in_grid) - dsign) * cell
    p = jnp.clip(pos_in_grid.astype(jnp.int32), 0, gridsize.astype(jnp.int32) - 1)
    tdelta = cell * step.astype(jnp.float32) * rd
    tmax = (grid_planes - (o - cube_min)) * rd
    return valid, t_entry, p, step, tdelta, tmax


def _select_axis(tmax):
    """Reference branch structure (scene.cpp:773-801) with NaN semantics:
    a NaN component loses every `<`, and when the *other* comparand is NaN
    the else-branch picks z — replicated exactly."""
    tx, ty, tz = tmax[..., 0], tmax[..., 1], tmax[..., 2]
    first = tx < ty
    pick_x = first & (tx < tz)
    pick_y = (~first) & (ty < tz)
    return jnp.where(pick_x, 0, jnp.where(pick_y, 1, 2))


def _fetch(grid_flat, gpad, p):
    idx = (p[..., 0] * gpad + p[..., 1]) * gpad + p[..., 2]
    return jnp.take(grid_flat, idx, mode="clip")


@partial(jax.jit, static_argnames=("gpad", "max_steps"))
def dda_nearest(grid_flat, gridsize, gpad, cube_min, o, d, rd, dsign,
                t_limit, active_in, skip_lo, skip_hi, max_steps=4096):
    """FindNearest / FindNearestExcept over one volume, all rays.

    skip_lo/skip_hi: inclusive material range to ignore (pass 1, 0 to skip
    nothing).  Returns (hit, t_hit, cell)."""
    n = o.shape[0]
    valid, t0, p, step, tdelta, tmax = setup_dda(cube_min, gridsize, o, d, rd, dsign)
    g = gridsize.astype(jnp.int32)

    state = dict(
        p=p, tmax=tmax, t=t0,
        active=active_in & valid & (t0 < t_limit),
        hit=jnp.zeros(n, bool),
        t_hit=jnp.zeros(n, jnp.float32),
        cell=jnp.full(n, MAT_NONE, jnp.int32),
        steps=jnp.int32(0),
    )

    def cond(s):
        return jnp.any(s["active"]) & (s["steps"] < max_steps)

    def body(s):
        cell = _fetch(grid_flat, gpad, s["p"])
        in_skip = (cell >= skip_lo) & (cell <= skip_hi) & (skip_hi >= skip_lo)
        pred = s["active"] & (cell != MAT_NONE) & (s["t"] < t_limit) & ~in_skip
        hit = s["hit"] | pred
        t_hit = jnp.where(pred, s["t"], s["t_hit"])
        cell_out = jnp.where(pred, cell, s["cell"])
        active = s["active"] & ~pred

        axis = _select_axis(s["tmax"])
        t_new = jnp.take_along_axis(s["tmax"], axis[:, None], axis=-1)[:, 0]
        p_new = s["p"] + (jax.nn.one_hot(axis, 3, dtype=jnp.int32) * step)
        moved = jnp.take_along_axis(p_new, axis[:, None], axis=-1)[:, 0]
        out = (moved < 0) | (moved >= g)
        tmax_new = s["tmax"] + jax.nn.one_hot(axis, 3, dtype=jnp.float32) * tdelta

        upd = active
        return dict(
            p=jnp.where(upd[:, None], p_new, s["p"]),
            tmax=jnp.where(upd[:, None], tmax_new, s["tmax"]),
            t=jnp.where(upd, t_new, s["t"]),
            active=active & ~out & (t_new < t_limit),
            hit=hit, t_hit=t_hit, cell=cell_out,
            steps=s["steps"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    sg = jax.lax.stop_gradient
    return sg(out["hit"]), sg(out["t_hit"]), sg(out["cell"])


@partial(jax.jit, static_argnames=("gpad", "max_steps"))
def dda_occluded(grid_flat, gridsize, gpad, cube_min, o, d, rd, dsign,
                 t_limit, active_in, max_steps=4096):
    """Scene::IsOccluded (scene.cpp:1009-1047): any non-NONE cell before
    t_limit blocks.  Returns occluded[N] bool."""
    hit, _, _ = dda_nearest(grid_flat, gridsize, gpad, cube_min, o, d, rd,
                            dsign, t_limit, active_in,
                            jnp.int32(1), jnp.int32(0), max_steps)
    return hit


@partial(jax.jit, static_argnames=("gpad", "max_steps"))
def dda_exit(grid_flat, gridsize, gpad, cube_min, o, d, rd, dsign,
             active_in, mode_code, glass_mat, smoke_lo, smoke_hi,
             max_steps=4096):
    """FindMaterialExit / FindSmokeExit (scene.cpp:875-1006): march THROUGH
    the medium until the cell predicate says "leave" or the grid is exited.

    mode_code[N]: EXIT_GLASS or EXIT_SMOKE per ray.
    Returns (left_into_cell, t, cell): left_into_cell False means the march
    fell off the grid (t = boundary crossing, cell unchanged-by-caller)."""
    n = o.shape[0]
    valid, t0, p, step, tdelta, tmax = setup_dda(cube_min, gridsize, o, d, rd, dsign)
    g = gridsize.astype(jnp.int32)

    state = dict(
        p=p, tmax=tmax, t=t0,
        active=active_in & valid,
        found=jnp.zeros(n, bool),
        t_out=jnp.where(valid, t0, jnp.zeros(n, jnp.float32)),
        cell=jnp.full(n, MAT_NONE, jnp.int32),
        in_volume=jnp.zeros(n, bool),
        steps=jnp.int32(0),
    )

    def cond(s):
        return jnp.any(s["active"]) & (s["steps"] < max_steps)

    def body(s):
        cell = _fetch(grid_flat, gpad, s["p"])
        is_glass_mode = mode_code == EXIT_GLASS
        leave_glass = cell != glass_mat
        leave_smoke = (cell > smoke_hi) | (cell < smoke_lo)
        leave = jnp.where(is_glass_mode, leave_glass, leave_smoke)
        pred = s["active"] & leave
        found = s["found"] | pred
        in_volume = s["in_volume"] | pred
        t_out = jnp.where(pred, s["t"], s["t_out"])
        cell_out = jnp.where(pred, cell, s["cell"])
        active = s["active"] & ~pred

        axis = _select_axis(s["tmax"])
        t_new = jnp.take_along_axis(s["tmax"], axis[:, None], axis=-1)[:, 0]
        p_new = s["p"] + (jax.nn.one_hot(axis, 3, dtype=jnp.int32) * step)
        moved = jnp.take_along_axis(p_new, axis[:, None], axis=-1)[:, 0]
        out = (moved < 0) | (moved >= g)
        tmax_new = s["tmax"] + jax.nn.one_hot(axis, 3, dtype=jnp.float32) * tdelta

        # boundary exit records the crossing t (scene.cpp:901-929)
        t_out = jnp.where(active & out, t_new, t_out)

        upd = active
        return dict(
            p=jnp.where(upd[:, None], p_new, s["p"]),
            tmax=jnp.where(upd[:, None], tmax_new, s["tmax"]),
            t=jnp.where(upd, t_new, s["t"]),
            active=active & ~out,
            found=found, t_out=t_out, cell=cell_out, in_volume=in_volume,
            steps=s["steps"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    sg = jax.lax.stop_gradient
    return sg(out["in_volume"]), sg(out["t_out"]), sg(out["cell"])


def normal_voxel(gridsize, fwd, o, d, t, dsign):
    """Batched Ray::GetNormalVoxel (scene.cpp:121-148): fractional-position
    face normal in object space, pushed to world by the fwd linear part."""
    ws = gridsize.astype(jnp.float32)
    i1 = (o + t[..., None] * d) * ws[..., None] if ws.ndim else (o + t[..., None] * d) * ws
    fg = i1 - jnp.floor(i1)
    dist = jnp.minimum(fg, 1.0 - fg)
    mind = dist.min(axis=-1, keepdims=True)
    sign = dsign * 2.0 - 1.0
    n_obj = jnp.where(dist == mind, sign, 0.0)
    n_world = jnp.einsum("ij,nj->ni", fwd[:3, :3], n_obj) if fwd.ndim == 2 else jnp.einsum("nij,nj->ni", fwd[..., :3, :3], n_obj)
    norm = jnp.sqrt((n_world * n_world).sum(-1, keepdims=True))
    return n_world / jnp.maximum(norm, 1e-20)
