"""Fast path-replay gradients: precomputed frozen geometry + one batched
span-binned segment march (VERDICT r4 item 3b — the capability-mode
render_diff_replay ran 0.53 Mrays/s at 1080p because every relaxed
segment marched seg_steps samples on EVERY lane, masked or not).

The estimator is render_diff_replay's (two replayed diffuse/metal
bounces, traced Fresnel legs, media chains) — restructured for the
training loop:

  * **Phase 1, `replay_precompute`** (once per camera/scene geometry —
    the hard traversals read `scene.volumes.grids`, never the params, so
    everything here is loop-invariant across optimizer steps): runs the
    hard traversals, freezes every hit record / bounce direction / light
    segment, compacts every relaxed march to the lanes that NEED it
    (host-side mask pull), clamps each segment to its occupied-brick
    span (diff.volumetric._occupied_spans) and bins segments by span
    length — the bench backward's (2, 10)-step recipe.

  * **Phase 2, `render_replay_active` / `grad_replay_active`** (per
    step): ONE batched march per (march, bin) over the compacted
    segments — core span samples via _cell_fetch (1-D scatter adjoint),
    statically-empty lead/tail at per-BRICK mean sigma (dense adjoint) —
    then a pure elementwise radiance assembly from the delivered taus,
    the differentiable albedo rows, and the frozen factors.

Cost: rows = sum over march-bins of steps x segments, instead of
(num marches) x seg_steps x full width.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from voxtracer.core import mathx
from voxtracer.core.types import (GLASS, METAL_HIGH, METAL_LOW,
                                  SMOKE_LOW_DENSITY, SMOKE_PLAYER, SceneData)
from voxtracer.diff.volumetric import (DiffParams, _bsig_rows,
                                       _brick_mean_sigma, _cell_fetch,
                                       _occupied_spans, _rows)
from voxtracer.render.sky import sample_sky

F32 = jnp.float32
BIG = 1e34
_EPS = 1e-3


# --------------------------------------------------------------------------
# Phase 1 — frozen geometry + compacted, span-binned segment lists
# --------------------------------------------------------------------------

def _light_segments(scene, p, nrm, mask_np):
    """Frozen shadow-segment geometry per active light at surface points
    p/nrm [n_c, 3]: list of (o, d, t_hi, radiance [n_c, 3], gate) —
    NumPy, deterministic lights only (the replay's estimator).  Black
    dir lights are dropped statically (host knows the colors)."""
    L = scene.lights
    out = []

    def fin(rad, gate):
        # masked lanes can hold BIG/overflowed surface points; their rad
        # must be a hard 0 (0 * inf = NaN would leak through the mask)
        return np.where(gate[:, None], np.nan_to_num(rad), 0.0)

    # clamp miss-lane points before any distance math overflows
    p = np.clip(p, -1e12, 1e12)
    o_sh = np.asarray(mathx.offset_ray(jnp.asarray(p), jnp.asarray(nrm),
                                       jnp))
    for i in range(int(L.n_point)):
        lpos = np.asarray(L.point_pos[i])
        to_l = lpos - p
        dst = np.sqrt((to_l * to_l).sum(-1))
        dirn = to_l / np.maximum(dst[:, None], 1e-20)
        cos_t = (dirn * nrm).sum(-1)
        rad = (cos_t / np.maximum(dst * dst, 1e-20))[:, None] \
            * np.asarray(L.point_color[i])
        gate = mask_np & (cos_t > 0.0)
        out.append((o_sh, dirn, dst, fin(rad, gate), gate))
    for i in range(int(L.n_spot)):
        lpos = np.asarray(L.spot_pos[i])
        to_l = lpos - p
        dst = np.sqrt((to_l * to_l).sum(-1))
        dirn = to_l / np.maximum(dst[:, None], 1e-20)
        cos_c = (dirn * np.asarray(L.spot_dir[i])).sum(-1)
        lcos = float(L.spot_cos_angle[i])
        alpha = 1.0 - (1.0 - cos_c) / (1.0 - lcos)
        rad = (cos_c / np.maximum(dst * dst, 1e-20) * alpha)[:, None] \
            * np.asarray(L.spot_color[i])
        gate = mask_np & (cos_c > lcos)
        out.append((o_sh, dirn, dst, fin(rad, gate), gate))
    # area lights: one frozen sample each (the replay's one-sample form)
    for i in range(int(L.n_area)):
        rng = np.random.default_rng(101 + i)
        gk = rng.normal(size=p.shape).astype(np.float32)
        rnd = gk / np.maximum(np.linalg.norm(gk, axis=-1, keepdims=True),
                              1e-20)
        target = np.asarray(L.area_pos[i]) + float(L.area_radius[i]) * rnd
        to_l = target - p
        dst = np.sqrt((to_l * to_l).sum(-1))
        dirn = to_l / np.maximum(dst[:, None], 1e-20)
        cos_t = (dirn * nrm).sum(-1)
        scale = (cos_t * float(L.area_mult[i]) * float(L.area_radius[i]) ** 2
                 * (4.0 * np.pi) / np.maximum(dst * dst, 1e-20))
        rad = scale[:, None] * np.asarray(L.area_color[i])
        gate = mask_np & (cos_t > 0.0)
        out.append((o_sh, dirn, dst, fin(rad, gate), gate))
    if np.any(np.asarray(L.dir_color) != 0.0):
        dirn = np.broadcast_to(-np.asarray(L.dir_direction),
                               p.shape).astype(np.float32)
        cos_d = (dirn * nrm).sum(-1)
        rad = cos_d[:, None] * np.asarray(L.dir_color)[None, :]
        gate = mask_np & (cos_d > 0.0)
        out.append((o_sh, dirn, np.full(p.shape[0], BIG, np.float32),
                    fin(rad, gate), gate))
    return out


def _build_march(scene, cfg, o, d, t_lo, t_hi, mask_np, kind,
                 edges=(4.0,), steps=(2, 10), lead_steps=2):
    """Compact one relaxed march to its needed lanes, clamp to occupied
    spans, bin by span length.  All inputs NumPy at width n_c; returns a
    march dict (device segment arrays + host bin table + delivery map)."""
    n_c = o.shape[0]
    sel = np.nonzero(mask_np)[0].astype(np.int32)
    m = sel.shape[0]
    march = {"n_lanes": n_c, "m": m, "kind": kind}
    if m == 0:
        return march
    os_, ds_ = o[sel], d[sel]
    lo_, hi_ = t_lo[sel], np.maximum(t_hi[sel], t_lo[sel])

    # occupied span of each segment (device slab pass, pulled to host —
    # same numerics as the traced _occupied_spans the backward uses)
    inv = np.asarray(scene.volumes.inv)
    vo = jnp.einsum("vij,nj->vni", jnp.asarray(inv[:, :3, :3]),
                    jnp.asarray(os_)) + jnp.asarray(inv)[:, None, :3, 3]
    vd = jnp.einsum("vij,nj->vni", jnp.asarray(inv[:, :3, :3]),
                    jnp.asarray(ds_))
    s0, s1 = _occupied_spans(scene, vo[:, :, 0], vo[:, :, 1], vo[:, :, 2],
                             vd[:, :, 0], vd[:, :, 1], vd[:, :, 2])
    s0 = np.asarray(jnp.min(jnp.where(s0 < 1e33, s0, BIG), axis=0))
    s1 = np.asarray(jnp.max(jnp.where(s1 > -1e33, s1, -BIG), axis=0))
    s0c = np.clip(s0, lo_, hi_)
    s1c = np.clip(s1, s0c, hi_)
    none = s0 > 1e33
    s0c = np.where(none, hi_, s0c)
    s1c = np.where(none, hi_, s1c)

    # span length in cells (max gridsize as the scale, like the bench)
    gs = float(np.asarray(scene.volumes.gridsize).max())
    span_cells = (s1c - s0c) * gs
    bin_id = np.searchsorted(np.asarray(edges, np.float32), span_cells)
    order = np.argsort(bin_id, kind="stable").astype(np.int32)
    counts = [int((bin_id == b).sum()) for b in range(len(edges) + 1)]
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(int)

    # delivery map: lane -> its segment position (m = none)
    pos_of_sel = np.empty(m, np.int32)
    pos_of_sel[order] = np.arange(m, dtype=np.int32)
    inv_map = np.full(n_c, m, np.int32)
    inv_map[sel] = pos_of_sel

    srt = order
    march.update(
        o=jnp.asarray(os_[srt]), d=jnp.asarray(ds_[srt]),
        t_lo=jnp.asarray(lo_[srt]), t_hi=jnp.asarray(hi_[srt]),
        s0=jnp.asarray(s0c[srt]), s1=jnp.asarray(s1c[srt]),
        inv_map=jnp.asarray(inv_map),
        bins=[(int(steps[b]), int(offs[b]), int(offs[b + 1]))
              for b in range(len(counts)) if counts[b] > 0],
        lead_steps=lead_steps,
    )
    return march


def _march_taus(params: DiffParams, scene: SceneData, spec, arr,
                density_scale: float, dens_flat, cell_tab, bsig):
    """Phase-2 march: per-(bin) core span samples + brick-granular
    lead/tail -> tau per segment, delivered to [n_lanes] via inv_map.
    spec = static structure (bins/m/kind), arr = the device segment
    arrays — split so the arrays ride the jit SIGNATURE instead of being
    baked into the program as constants (a 1080p precompute embedded
    ~hundreds of MB of literals and the tunnel compiler rejected the
    request with HTTP 413)."""
    march = {**spec, **arr}
    if march["m"] == 0:
        return jnp.zeros(march["n_lanes"], F32)
    vols = scene.volumes
    v, g = vols.n, vols.pad_size
    gs_f = vols.gridsize.astype(F32)
    gs_i = vols.gridsize
    cb = vols.cube_min
    m3 = vols.occ.shape[2]
    msp = round(m3 ** (1.0 / 3.0))
    kind = march["kind"]
    delta = 4.0 / density_scale

    o, d = march["o"], march["d"]
    inv = vols.inv
    vo = jnp.einsum("vij,nj->vni", inv[:, :3, :3], o) + inv[:, None, :3, 3]
    vd = jnp.einsum("vij,nj->vni", inv[:, :3, :3], d)
    mm = o.shape[0]
    tau = jnp.zeros(mm, F32)

    def integrand(sig):
        # kind 0: optical depth; kind 1: soft occupied length
        return (1.0 - jnp.exp(-sig * delta)) if kind == 1 else sig

    def seg_sum(t_lo, t_hi, steps, lo_i, n_i, brick):
        t_lo_b = jax.lax.dynamic_slice_in_dim(t_lo, lo_i, n_i)
        t_hi_b = jax.lax.dynamic_slice_in_dim(t_hi, lo_i, n_i)
        dt = jnp.maximum(t_hi_b - t_lo_b, 0.0) / steps
        acc = jnp.zeros(n_i, F32)
        for kk in range(steps):
            t_mid = t_lo_b + (kk + 0.5) * dt
            flat = jnp.zeros(n_i, jnp.int32)
            inside_any = jnp.zeros(n_i, bool)
            for j in range(v):
                voj = jax.lax.dynamic_slice_in_dim(vo[j], lo_i, n_i, 0)
                vdj = jax.lax.dynamic_slice_in_dim(vd[j], lo_i, n_i, 0)
                l = (voj + t_mid[:, None] * vdj - cb[j]) * gs_f[j]
                if brick:
                    ib = jnp.clip((l * 0.125).astype(jnp.int32), 0,
                                  (gs_i[j] + 7) // 8 - 1)
                    f = (j * m3 + (ib[:, 0] * msp + ib[:, 1]) * msp
                         + ib[:, 2])
                else:
                    idx = jnp.clip(l.astype(jnp.int32), 0, gs_i[j] - 1)
                    f = ((idx[:, 0] * g + idx[:, 1]) * g + idx[:, 2]
                         + j * (g * g * g))
                inside = jnp.all((l >= 0.0) & (l < gs_f[j]), axis=-1)
                flat = jnp.where(inside & ~inside_any, f, flat)
                inside_any = inside_any | inside
            if brick:
                sig = _bsig_rows(bsig, flat)
            else:
                sig = _cell_fetch(dens_flat, cell_tab, flat)[:, 0]
            acc = acc + jnp.where(inside_any, integrand(sig), 0.0) * dt
        return acc

    ls = march["lead_steps"]
    for steps, lo_i, hi_i in march["bins"]:
        n_i = hi_i - lo_i
        part = jnp.zeros(n_i, F32)
        if steps > 0:
            part = part + seg_sum(march["s0"], march["s1"], steps, lo_i,
                                  n_i, brick=False)
        if ls > 0:
            part = part + seg_sum(march["t_lo"], march["s0"], ls, lo_i,
                                  n_i, brick=True)
            part = part + seg_sum(march["s1"], march["t_hi"], ls, lo_i,
                                  n_i, brick=True)
        tau = jax.lax.dynamic_update_slice_in_dim(tau, part, lo_i, 0)
    return jnp.take(jnp.concatenate([tau, jnp.zeros(1, F32)]),
                    march["inv_map"])


def replay_precompute(scene: SceneData, cfg, key, rows: int = 0,
                      row0: int = 0, edges=(4.0,), steps=(2, 10),
                      tau0_steps=(4, 16)):
    """Phase 1: freeze the whole replay path (see module docstring).

    Returns a dict pytree; device arrays inside are jit-argument-ready.
    Media chains (glass/smoke primaries) are included only when the scene
    HAS such lanes — monu-class scenes carry 6 marches (tau0 + shadow at
    3 surfaces + 2 bounce segments)."""
    from voxtracer.render.camera import primary_rays
    from voxtracer.render.integrator import _pixel_grid, find_nearest_world

    h = rows or cfg.height
    x = np.arange(cfg.width, dtype=np.float32)
    y = np.arange(h, dtype=np.float32) + row0
    px, py = np.meshgrid(x, y)
    o_np, d_np = primary_rays(jax.tree.map(np.asarray, scene.camera),
                              cfg.width, cfg.height, px.reshape(-1),
                              py.reshape(-1), None, np)
    n = o_np.shape[0]
    o, d = jnp.asarray(o_np), jnp.asarray(d_np)

    rec0 = find_nearest_world(scene, o, d, jnp.ones(n, bool))
    hit0 = np.asarray(rec0["hit"])
    # compact to hit lanes, tile-ordered (non-hit pixels render frozen bg)
    if cfg.width % 128 == 0:
        yi = py.reshape(-1).astype(np.int64)
        xi = px.reshape(-1).astype(np.int64)
        tile_key = (((yi // 8) * (cfg.width // 128) + xi // 128) * 1024
                    + (yi % 8) * 128 + xi % 128)
    else:
        tile_key = np.arange(n, dtype=np.int64)
    perm = np.lexsort((tile_key, ~hit0)).astype(np.int32)
    n_hit = int(hit0.sum())
    n_c = min(-(-max(n_hit, 1) // 1024) * 1024, n)
    sel = perm[:n_c]

    def c(a):
        return np.asarray(a)[sel]

    m0 = c(rec0["mat"]).astype(np.int32)
    t0 = c(rec0["t"])
    n0 = c(rec0["normal"])
    oc, dc = o_np[sel], d_np[sel]
    p0 = oc + t0[:, None] * dc
    hit_c = c(rec0["hit"]) & (np.arange(n_c) < n_hit)

    is_metal = (m0 >= METAL_HIGH) & (m0 <= METAL_LOW)
    is_diffuse = m0 < METAL_HIGH
    is_glass = m0 == GLASS
    is_smoke = (m0 >= SMOKE_LOW_DENSITY) & (m0 <= SMOKE_PLAYER)
    media = is_glass | is_smoke
    bounce = hit_c & (is_metal | is_diffuse)

    # frozen bounce directions — the SAME draws as render_diff_replay
    # (jax.random streams, compacted), so the two estimators replay
    # identical paths on diffuse/metal lanes
    gk = np.asarray(jax.random.normal(jax.random.fold_in(key, 2),
                                      (n, 3), F32))[sel]
    sph = gk / np.maximum(np.linalg.norm(gk, axis=-1, keepdims=True), 1e-20)
    refl = np.asarray(mathx.reflect(jnp.asarray(dc), jnp.asarray(n0)))
    d1 = np.where(is_metal[:, None], refl, n0 + sph)
    d1 = d1 / np.maximum(np.linalg.norm(d1, axis=-1, keepdims=True), 1e-20)
    o1 = np.asarray(mathx.offset_ray(jnp.asarray(p0), jnp.asarray(n0), jnp))

    def far_np(o_, d_):
        from voxtracer.diff.path_replay import _far_bound

        return np.asarray(_far_bound(scene, jnp.asarray(o_),
                                     jnp.asarray(d_)))

    def leg(o_, d_, mask_np, seed):
        rec = find_nearest_world(scene, jnp.asarray(o_), jnp.asarray(d_),
                                 jnp.asarray(mask_np))
        hit = np.asarray(rec["hit"]) & mask_np
        t = np.asarray(rec["t"])
        mm = np.asarray(rec["mat"]).astype(np.int32)
        nn = np.asarray(rec["normal"])
        p = o_ + t[:, None] * d_
        far = far_np(o_, d_)
        seg_hi = np.where(hit, np.maximum(t - _EPS, 0.0), far)
        sky = np.asarray(sample_sky(scene.sky, jnp.asarray(d_),
                                    cfg.activate_sky, cfg.sky_fallback))
        return dict(hit=hit, t=t, m=mm, n=nn, p=p, seg_hi=seg_hi, sky=sky)

    leg1 = leg(o1, d1, bounce, 1)
    m1 = leg1["m"]
    is_metal1 = (m1 >= METAL_HIGH) & (m1 <= METAL_LOW)
    bounce2 = bounce & leg1["hit"] & ((m1 < METAL_HIGH) | is_metal1)
    gk2 = np.asarray(jax.random.normal(jax.random.fold_in(key, 4),
                                       (n, 3), F32))[sel]
    sph2 = gk2 / np.maximum(np.linalg.norm(gk2, axis=-1, keepdims=True),
                            1e-20)
    refl1 = np.asarray(mathx.reflect(jnp.asarray(d1),
                                     jnp.asarray(leg1["n"])))
    d2 = np.where(is_metal1[:, None], refl1, leg1["n"] + sph2)
    d2 = d2 / np.maximum(np.linalg.norm(d2, axis=-1, keepdims=True), 1e-20)
    o2 = np.asarray(mathx.offset_ray(jnp.asarray(leg1["p"]),
                                     jnp.asarray(leg1["n"]), jnp))
    leg2 = leg(o2, d2, bounce2, 2)

    far0 = far_np(oc, dc)
    mb = partial(_build_march, scene, cfg, edges=edges, steps=steps)
    marches = {
        "tau0": _build_march(scene, cfg, oc, dc, np.zeros(n_c, np.float32),
                             far0, hit_c, 0, edges=edges, steps=tau0_steps),
        "tau01": mb(o1, d1, np.full(n_c, _EPS, np.float32),
                    leg1["seg_hi"], bounce, 0),
        "tau12": mb(o2, d2, np.full(n_c, _EPS, np.float32),
                    leg2["seg_hi"], bounce2, 0),
    }
    lights = {
        "e0": _light_segments(scene, p0, n0, hit_c & ~media),
        "e1": _light_segments(scene, leg1["p"], leg1["n"],
                              bounce & leg1["hit"]),
        "e2": _light_segments(scene, leg2["p"], leg2["n"],
                              bounce2 & leg2["hit"]),
    }
    light_marches = {}
    light_rads = {}
    for name, segs in lights.items():
        lm = []
        lr = []
        for (o_sh, dirn, dst, rad, gate) in segs:
            lm.append(mb(o_sh, dirn, np.full(n_c, _EPS, np.float32),
                         dst, gate, 0))
            lr.append((jnp.asarray(rad), jnp.asarray(gate)))
        light_marches[name] = lm
        light_rads[name] = lr

    bg_full = np.asarray(sample_sky(scene.sky, jnp.asarray(d_np),
                                    cfg.activate_sky, cfg.sky_fallback))
    pre = dict(
        n=n, n_c=n_c, n_hit=n_hit, sel=jnp.asarray(sel),
        perm=jnp.asarray(perm),
        hit=jnp.asarray(hit_c & ~media),  # media lanes -> frozen bg here;
        # render_diff_replay covers their chains (pre['media_lanes'])
        m0=jnp.asarray(m0), bounce=jnp.asarray(bounce),
        bounce2=jnp.asarray(bounce2),
        shade0=jnp.asarray(hit_c & ~media),
        m1=jnp.asarray(m1), hit1=jnp.asarray(leg1["hit"]),
        sky1=jnp.asarray(leg1["sky"]),
        m2=jnp.asarray(leg2["m"]), hit2=jnp.asarray(leg2["hit"]),
        sky2=jnp.asarray(leg2["sky"]),
        bg=jnp.asarray(bg_full[sel]),
        marches=marches, light_marches=light_marches,
        light_rads=light_rads,
        media_lanes=int((hit_c & (is_glass | is_smoke)).sum()),
    )
    return pre


# --------------------------------------------------------------------------
# Phase 2 — per-step differentiable assembly
# --------------------------------------------------------------------------

def split_pre(pre):
    """pre -> (spec, arrs): static structure vs device arrays, so phase-2
    jits take the arrays as ARGUMENTS (see _march_taus docstring)."""
    ak = ("o", "d", "t_lo", "t_hi", "s0", "s1", "inv_map")

    def sm(m):
        return ({k: v for k, v in m.items() if k not in ak},
                {k: m[k] for k in ak if k in m})

    spec_m, arr_m = {}, {}
    for nm, m in pre["marches"].items():
        spec_m[nm], arr_m[nm] = sm(m)
    spec_lm, arr_lm = {}, {}
    for nm, lst in pre["light_marches"].items():
        pairs = [sm(m) for m in lst]
        spec_lm[nm] = [q[0] for q in pairs]
        arr_lm[nm] = [q[1] for q in pairs]
    lane_keys = ("hit", "m0", "bounce", "bounce2", "shade0", "m1", "hit1",
                 "sky1", "m2", "hit2", "sky2", "bg")
    arrs = dict(marches=arr_m, lm=arr_lm, lr=pre["light_rads"],
                lanes={k: pre[k] for k in lane_keys})
    spec = dict(n=pre["n"], n_c=pre["n_c"], n_hit=pre["n_hit"],
                media_lanes=pre["media_lanes"], marches=spec_m, lm=spec_lm)
    return spec, arrs


def render_replay_active(params: DiffParams, scene: SceneData, cfg, spec,
                         arrs, density_scale: float = 64.0):
    """Radiance for the compacted hit lanes [n_c, 3] from precomputed
    frozen geometry (replay_precompute).  Differentiable in params only —
    the 2-bounce diffuse/metal replay estimator (media-class primary
    lanes shade their frozen background here; pre['media_lanes'] reports
    how many — the capability-mode render_diff_replay covers them)."""
    dens_flat = (jax.nn.softplus(params.density_logits).reshape(-1)
                 * density_scale)
    cell_tab = jax.lax.stop_gradient(jnp.stack(
        [dens_flat, scene.volumes.grids.reshape(-1).astype(F32)], axis=1))
    bsig = _brick_mean_sigma(params, scene, density_scale)
    alb_tab = params.albedo_table

    lanes = arrs["lanes"]

    def taus(sp, ar):
        return _march_taus(params, scene, sp, ar, density_scale, dens_flat,
                           cell_tab, bsig)

    def direct(name):
        acc = jnp.zeros((spec["n_c"], 3), F32)
        for sp, ar, (rad, gate) in zip(spec["lm"][name],
                                       arrs["lm"][name],
                                       arrs["lr"][name]):
            vs = jnp.where(gate, jnp.exp(-taus(sp, ar)), 0.0)
            acc = acc + vs[:, None] * rad
        return acc

    tau0 = taus(spec["marches"]["tau0"], arrs["marches"]["tau0"])
    w0 = 1.0 - jnp.exp(-tau0)
    alb0 = _rows(alb_tab, jnp.clip(lanes["m0"], 0, 255))
    e0 = direct("e0")
    # render_diff_replay shades direct0 = alb0·E0 at every non-media hit
    direct0 = jnp.where(lanes["shade0"][:, None], alb0 * e0, 0.0)

    v01 = jnp.exp(-taus(spec["marches"]["tau01"],
                        arrs["marches"]["tau01"]))
    v12 = jnp.exp(-taus(spec["marches"]["tau12"],
                        arrs["marches"]["tau12"]))
    alb1 = _rows(alb_tab, jnp.clip(lanes["m1"], 0, 255))
    alb2 = _rows(alb_tab, jnp.clip(lanes["m2"], 0, 255))
    e1 = direct("e1")
    e2 = direct("e2")
    l2 = jnp.where(lanes["hit2"][:, None], alb2 * e2, lanes["sky2"])
    rad2 = v12[:, None] * l2
    l1 = jnp.where(lanes["hit1"][:, None],
                   alb1 * (e1 + jnp.where(lanes["bounce2"][:, None], rad2,
                                          0.0)),
                   lanes["sky1"])
    bounce_rad = jnp.where(lanes["bounce"][:, None],
                           alb0 * v01[:, None] * l1, 0.0)

    lsurf = direct0 + bounce_rad
    img = jnp.where(lanes["hit"][:, None],
                    w0[:, None] * lsurf + (1.0 - w0)[:, None] * lanes["bg"],
                    lanes["bg"])
    return img


def mse_loss_replay_active(params: DiffParams, scene: SceneData, cfg, spec,
                           arrs, target_active, denom: float,
                           density_scale: float = 64.0):
    """Sum of squared error over the compacted hit lanes / denom — with
    denom = the full-frame pixel-element count this has exactly the
    full-image MSE gradient (non-hit pixels render the frozen bg)."""
    img = render_replay_active(params, scene, cfg, spec, arrs,
                               density_scale)
    err = jnp.sum((img - target_active) ** 2, axis=-1)
    err = jnp.where(jnp.arange(spec["n_c"]) < spec["n_hit"], err, 0.0)
    return jnp.sum(err) / denom


def make_replay_grad_fn(scene: SceneData, cfg, pre, target_active,
                        denom: float, density_scale: float = 64.0):
    """Jitted params -> grads closure.  `pre` splits into static
    structure (closed over) and device arrays (jit ARGUMENTS, partially
    applied here) — embedding them as constants blew the tunnel
    compiler's request-size limit at 1080p."""
    spec, arrs = split_pre(pre)

    def loss(params, arrs_, tgt):
        return mse_loss_replay_active(params, scene, cfg, spec, arrs_,
                                      tgt, denom, density_scale)

    gjit = jax.jit(jax.grad(loss))
    ljit = jax.jit(loss)
    return (lambda params: gjit(params, arrs, target_active),
            lambda params: ljit(params, arrs, target_active))
