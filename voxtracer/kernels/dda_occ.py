"""Occupancy-bitmask wavefront DDA — the gather-starved traversal.

Second-generation traversal kernel (same semantics as kernels/dda.py's
brick variant, which remains the oracle-adjacent fallback for the dynamic
skip-range modes).  Motivation, measured on the target chip (PERF_NOTES.md):

 * ``jnp.take`` costs ~7 ns/index — the entire frame cost of the v1 kernel
   is per-step cell gathers over all ray x volume pairs, lockstep to the
   worst pair.
 * A 2-D **row gather** (``take(table[T,16], idx, axis=0)``) costs ~2.6 ns
   per index *total* — one fetch returns 16 int32 = the full 512-bit
   occupancy of an 8^3 brick.
 * Register bit tests + a 16-way where-tree select cost ~0.1 ns/ray — so
   once a brick's bits are in vector registers, *cell stepping is free*.

Loop structure: one outer iteration = ONE occupancy row fetch per pair
(serving both levels: macro pairs test brick emptiness, fine pairs read
their current brick's bits), then a macro DDA step for pairs over empty
bricks, a descend for pairs entering occupied bricks, and up to INNER
unrolled gather-free cell steps for fine pairs.  Gather traffic per pair
drops from (cells crossed) x 7 ns to (bricks crossed) x 2.6 ns.

Semantics parity: identical to dda.traverse with bricks (t updated to the
crossing before bounds checks, earliest-volume tie wins, NaN axis-pick
behavior, stop_gradient'ed outputs).  Reference call stack being replaced:
Scene::FindNearest / FindMaterialExit / FindSmokeExit / IsOccluded
(scene.cpp:719-1047) under Renderer::FindNearest's instance loop
(renderer.cpp:946-1018).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from voxtracer.core.types import MAT_NONE, OCC_EXIT_GLASS, OCC_EXIT_SMOKE
from voxtracer.kernels.dda import (
    BIG,
    BRICK,
    EXIT_SMOKE,
    F32,
    I32,
    _normal_components,
    _object_rays,
    _pick_axis,
    _setup,
)

INNER = 8  # gather-free fine steps per outer iteration (tuned on-chip)


def _tree16(words, w):
    """Select words[w] per lane from 16 [V, N] arrays via a where-tree
    (take_along_axis is ~200x slower here, PERF_NOTES.md)."""
    sel = list(words)
    for k in range(4):
        bit = (w >> k) & 1
        sel = [jnp.where(bit == 1, sel[2 * j + 1], sel[2 * j])
               for j in range(len(sel) // 2)]
    return sel[0]


@partial(jax.jit, static_argnames=("mode", "max_outer", "inner"))
def traverse_occ(grids_flat, gridsize, inv, fwd, cube_min, o, d, t_limit,
                 ray_active, vol_enabled, occ, bricksize,
                 mode="nearest", mode_code=None, vol_match=None,
                 max_outer=1024, inner=INNER):
    """Fused all-rays x all-volumes traversal over occupancy bitmasks.

    occ: [3, V, M^3, 16] int32 (core.types.OCC_* planes).
    Returns the same per-ray dicts as dda.traverse for the matching mode.
    """
    v = gridsize.shape[0]
    n = o.shape[0]
    is_exit = mode == "exit"

    r = _object_rays(inv, o, d)
    bx = cube_min[:, 0][:, None]
    by = cube_min[:, 1][:, None]
    bz = cube_min[:, 2][:, None]
    gs_f = gridsize.astype(F32)[:, None]
    gs_i = gridsize[:, None]
    ms_f = bricksize.astype(F32)[:, None]
    ms_i = bricksize[:, None]

    g3 = grids_flat.shape[0] // v
    side = round(g3 ** (1.0 / 3.0))
    assert side ** 3 == g3, "grids must be padded cubes"
    side = jnp.int32(side)
    vol_base = (jnp.arange(v, dtype=I32) * g3)[:, None]

    m3 = occ.shape[2]
    mside = round(m3 ** (1.0 / 3.0))
    assert mside ** 3 == m3, "occ must be padded cubes"
    mside = jnp.int32(mside)
    occ_flat = occ.reshape(3 * v * m3, 16)
    macro_base = (jnp.arange(v, dtype=I32) * m3)[:, None]
    if is_exit:
        plane = jnp.where(mode_code[None, :] == EXIT_SMOKE,
                          OCC_EXIT_SMOKE, OCC_EXIT_GLASS).astype(I32) * (v * m3)
        match = vol_match[None, :] == jnp.arange(v, dtype=I32)[:, None]
    else:
        plane = jnp.int32(0)

    tl = t_limit[None, :]

    s = _setup(r, bx, by, bz, gs_f, gs_i)      # fine-level consts
    sm = _setup(r, bx, by, bz, ms_f, ms_i)     # macro level
    valid = sm["valid"]
    t0 = sm["t0"]

    if is_exit:
        active0 = ray_active[None, :] & match & valid
    else:
        active0 = (ray_active[None, :] & vol_enabled[:, None] & valid
                   & (t0 < tl))

    cellw = 1.0 / gs_f

    def fine_init_at(t):
        """Setup3DDDA position seeding (scene.cpp:736-745) at parameter t
        — identical arithmetic to dda.py's fine_init_at."""
        def axis(oc, dc, rdc, sc, b0):
            pos = gs_f * ((oc - b0) + (t + 5e-5) * dc)
            pln = (jnp.ceil(pos) - sc) * cellw
            p = jnp.clip(pos.astype(I32), 0, gs_i - 1)
            tm = (pln - (oc - b0)) * rdc
            return p, tm

        px, tmx = axis(r["ox"], r["dx"], r["rdx"], r["sx"], bx)
        py, tmy = axis(r["oy"], r["dy"], r["rdy"], r["sy"], by)
        pz, tmz = axis(r["oz"], r["dz"], r["rdz"], r["sz"], bz)
        return px, py, pz, tmx, tmy, tmz

    state = dict(
        t=t0, active=active0, level=jnp.zeros((v, n), bool),
        hit=jnp.zeros((v, n), bool),
        t_hit=jnp.zeros((v, n), F32),
        gidx=jnp.zeros((v, n), I32),
        in_vol=jnp.zeros((v, n), bool),
        t_out=jnp.where(valid, t0, 0.0),
        px=s["px"], py=s["py"], pz=s["pz"],
        tmx=s["tmx"], tmy=s["tmy"], tmz=s["tmz"],
        mpx=sm["px"], mpy=sm["py"], mpz=sm["pz"],
        mtmx=sm["tmx"], mtmy=sm["tmy"], mtmz=sm["tmz"],
        outer=jnp.int32(0),
    )
    stx, sty, stz = s["stx"], s["sty"], s["stz"]

    def body(st):
        # ---- cross-pair pruning: a ray's best recorded hit bounds every
        # one of its pairs (ordered-traversal effect without ordering);
        # for occlusion any hit retires the whole ray.  Strictly-greater
        # pruning keeps exact-t ties alive so the earliest-volume
        # tie-break stays bit-identical to the v1 kernel.
        if mode == "occluded":
            ray_done = jnp.any(st["hit"], axis=0)
            st = dict(st, active=st["active"] & ~ray_done[None, :])
        elif not is_exit:
            best = jnp.min(jnp.where(st["hit"], st["t_hit"], BIG), axis=0)
            st = dict(st, active=st["active"] & (st["t"] <= best[None, :]))

        # ---- ONE row fetch per pair: current brick's 512 occupancy bits.
        # Macro pairs use it for the empty test; fine pairs for bit tests
        # (their macro position still points at the brick they walk).
        midx = (st["mpx"] * mside + st["mpy"]) * mside + st["mpz"]
        rows_idx = plane + macro_base + midx
        rows = jnp.take(occ_flat, rows_idx.reshape(-1), axis=0, mode="clip")
        words = tuple(rows[:, k].reshape(v, n) for k in range(16))
        nonempty = words[0]
        for k in range(1, 16):
            nonempty = nonempty | words[k]
        occupied = nonempty != 0

        act_m = st["active"] & ~st["level"]
        descend = act_m & occupied
        skip = act_m & ~occupied

        # ---- descend: (re)seed fine DDA at t, clamp into the brick
        fpx, fpy, fpz, ftmx, ftmy, ftmz = fine_init_at(st["t"])
        blox = st["mpx"] * BRICK
        bloy = st["mpy"] * BRICK
        bloz = st["mpz"] * BRICK
        fpx = jnp.clip(fpx, blox, jnp.minimum(blox + BRICK - 1, gs_i - 1))
        fpy = jnp.clip(fpy, bloy, jnp.minimum(bloy + BRICK - 1, gs_i - 1))
        fpz = jnp.clip(fpz, bloz, jnp.minimum(bloz + BRICK - 1, gs_i - 1))
        px = jnp.where(descend, fpx, st["px"])
        py = jnp.where(descend, fpy, st["py"])
        pz = jnp.where(descend, fpz, st["pz"])
        tmx = jnp.where(descend, ftmx, st["tmx"])
        tmy = jnp.where(descend, ftmy, st["tmy"])
        tmz = jnp.where(descend, ftmz, st["tmz"])

        # ---- gather-free fine steps
        act_f = st["active"] & (st["level"] | descend)
        t = st["t"]
        t_out = st["t_out"]
        hit, t_hit, gidx = st["hit"], st["t_hit"], st["gidx"]
        in_vol = st["in_vol"]
        go_macro = jnp.zeros_like(act_f)
        for _ in range(inner):
            b = ((px - blox) * 8 + (py - bloy)) * 8 + (pz - bloz)
            word = _tree16(words, b >> 5)
            bit = (jnp.right_shift(word, b & 31) & 1) == 1
            if is_exit:
                pred = act_f & bit
            else:
                pred = act_f & bit & (t < tl)
            hit = hit | pred
            t_hit = jnp.where(pred, t, t_hit)
            gidx = jnp.where(pred, vol_base + (px * side + py) * side + pz,
                             gidx)
            if is_exit:
                in_vol = in_vol | pred
                t_out = jnp.where(pred, t, t_out)
            act_f = act_f & ~pred

            use_x, use_y, use_z = _pick_axis(tmx, tmy, tmz)
            t_new = jnp.where(use_x, tmx, jnp.where(use_y, tmy, tmz))
            px = px + jnp.where(act_f & use_x, stx, 0)
            py = py + jnp.where(act_f & use_y, sty, 0)
            pz = pz + jnp.where(act_f & use_z, stz, 0)
            moved = jnp.where(use_x, px, jnp.where(use_y, py, pz))
            out_grid = (moved < 0) | (moved >= gs_i)
            blo = jnp.where(use_x, blox, jnp.where(use_y, bloy, bloz))
            out_brick = (moved < blo) | (moved >= blo + BRICK)
            tmx = tmx + jnp.where(act_f & use_x, s["tdx"], 0.0)
            tmy = tmy + jnp.where(act_f & use_y, s["tdy"], 0.0)
            tmz = tmz + jnp.where(act_f & use_z, s["tdz"], 0.0)
            t = jnp.where(act_f, t_new, t)
            if not is_exit:
                act_f = act_f & (t_new < tl)
            if is_exit:
                t_out = jnp.where(act_f & out_grid, t_new, t_out)
            leave = act_f & out_brick & ~out_grid
            go_macro = go_macro | leave
            act_f = act_f & ~out_grid & ~out_brick

        # terminated fine pairs (hit or fell off grid or over t-limit) are
        # exactly those that were fine, aren't stepping on, and aren't
        # handing back to the macro walk
        was_fine = st["level"] | descend
        active = jnp.where(was_fine, act_f | go_macro, st["active"])
        level = was_fine & act_f

        # ---- macro advance: empty-brick skips + fine walks that left
        do_m = skip | go_macro
        mx, my, mz = _pick_axis(st["mtmx"], st["mtmy"], st["mtmz"])
        mt_new = jnp.where(mx, st["mtmx"], jnp.where(my, st["mtmy"], st["mtmz"]))
        mpx = st["mpx"] + jnp.where(do_m & mx, stx, 0)
        mpy = st["mpy"] + jnp.where(do_m & my, sty, 0)
        mpz = st["mpz"] + jnp.where(do_m & mz, stz, 0)
        mmoved = jnp.where(mx, mpx, jnp.where(my, mpy, mpz))
        m_out = (mmoved < 0) | (mmoved >= ms_i)
        mtmx = st["mtmx"] + jnp.where(do_m & mx, sm["tdx"], 0.0)
        mtmy = st["mtmy"] + jnp.where(do_m & my, sm["tdy"], 0.0)
        mtmz = st["mtmz"] + jnp.where(do_m & mz, sm["tdz"], 0.0)
        t = jnp.where(do_m, mt_new, t)
        if is_exit:
            t_out = jnp.where(do_m & m_out, mt_new, t_out)
        active = active & ~(do_m & m_out)
        if not is_exit:
            active = active & ~(do_m & ~(mt_new < tl))

        return dict(
            t=t, active=active, level=level, hit=hit, t_hit=t_hit,
            gidx=gidx, in_vol=in_vol, t_out=t_out,
            px=px, py=py, pz=pz, tmx=tmx, tmy=tmy, tmz=tmz,
            mpx=mpx, mpy=mpy, mpz=mpz, mtmx=mtmx, mtmy=mtmy, mtmz=mtmz,
            outer=st["outer"] + 1,
        )

    def cond(st):
        return jnp.any(st["active"]) & (st["outer"] < max_outer)

    st = jax.lax.while_loop(cond, body, state)
    sg = jax.lax.stop_gradient

    if mode == "occluded":
        return dict(hit=sg(jnp.any(st["hit"], axis=0)))

    if is_exit:
        nx, ny, nz = _normal_components(r, gs_f, fwd, st["t_out"])
        pick = lambda a: sg(jnp.sum(jnp.where(match, a, 0), axis=0))
        gidx_ray = pick(jnp.where(st["in_vol"], st["gidx"], 0)).astype(I32)
        cell = jnp.take(grids_flat, gidx_ray, mode="clip")
        in_v = sg(jnp.any(st["in_vol"] & match, axis=0))
        return dict(
            in_vol=in_v,
            t=pick(st["t_out"]),
            cell=sg(jnp.where(in_v, cell, MAT_NONE)),
            nx=pick(jnp.where(st["in_vol"], nx, 0.0)),
            ny=pick(jnp.where(st["in_vol"], ny, 0.0)),
            nz=pick(jnp.where(st["in_vol"], nz, 0.0)),
        )

    # nearest: merge volumes, earliest volume wins ties (argmin is first-min)
    t_pair = jnp.where(st["hit"], st["t_hit"], BIG)
    win = jnp.argmin(t_pair, axis=0)  # [N]
    winm = win[None, :] == jnp.arange(v, dtype=I32)[:, None]
    nx, ny, nz = _normal_components(r, gs_f, fwd, st["t_hit"])
    pick = lambda a, zero: sg(jnp.sum(jnp.where(winm & st["hit"], a, zero),
                                      axis=0))
    any_hit = jnp.any(st["hit"], axis=0)
    gidx_ray = pick(st["gidx"], 0).astype(I32)
    mat = jnp.take(grids_flat, gidx_ray, mode="clip")
    return dict(
        hit=sg(any_hit),
        t=sg(jnp.where(any_hit, jnp.min(t_pair, axis=0), BIG)),
        cell=sg(jnp.where(any_hit, mat, MAT_NONE)),
        vol=sg(jnp.where(any_hit, win, -2)),
        nx=pick(nx, 0.0), ny=pick(ny, 0.0), nz=pick(nz, 0.0),
    )
