"""Pallas (Mosaic) fused traversal — the VMEM-resident DDA kernel.

Round-1 traversal (kernels/dda_occ.py) is gather-bound: every outer
iteration fetches one occupancy row per ray x volume pair from HBM at a
measured ~4.8 ns/row (scripts/probe_pallas.py, honest tunnel timing).
Inside a Pallas kernel the same fetch is a `tpu.dynamic_gather` lane
shuffle from a VMEM-resident table at ~0.007 ns/idx (128-entry table) or
~0.08 ns/idx (2048-entry table via a 16-block where-chain) — 60-600x
cheaper.  This kernel therefore keeps ALL traversal tables in VMEM and
runs the whole DDA loop on-core:

  * brick-occupied bitmask  (V x M^3 bits as int32 words, <=1 KiB)   —
    macro empty-space test = ONE lane gather + bit test;
  * per-brick 512-bit cell-occupancy rows ([V*M^3, 16] words)        —
    fetched only on brick DESCEND via 16 chained lane gathers;
  * per-volume constants (inv/fwd/cube/gridsize, [26, V])            —
    free lane gathers at candidate-switch time.

Structure differences vs dda_occ (same RESULTS):
  * per-LANE sequential candidates instead of [V, N] pairs: each ray
    walks its volumes in cube-entry-t order (sorted in XLA beforehand)
    and stops as soon as its best hit precedes the next candidate's
    entry — work per ray is ~1 volume walk instead of K lockstep pair
    walks;
  * the per-walk t-limit is min(t_limit, nextafter(best_t)) so an
    exact-t tie in a later candidate can still be recorded and lose the
    earliest-original-volume tie-break (parity with traverse_occ_topk).

Reference being replaced: Scene::FindNearest / IsOccluded
(scene.cpp:719-1047) under Renderer::FindNearest's instance loop
(renderer.cpp:946-1018).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxtracer.core.types import MAT_NONE, OCC_ANY
from voxtracer.kernels.dda import BIG, BRICK, F32, I32, _setup
from voxtracer.kernels.dda_occ import _tree16

INNER = 8  # gather-free fine steps per outer iteration


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


# --------------------------------------------------------------------------
# In-kernel gather helpers (tpu.dynamic_gather via 2-D take_along_axis)
# --------------------------------------------------------------------------

def _g128(row, idx):
    """Per-lane gather from a 128-entry table: row [128], idx [B,128]."""
    tab = jnp.broadcast_to(row[None, :], idx.shape)
    return jnp.take_along_axis(tab, idx & 127, axis=1)


def _gchain(rows, idx, nblocks):
    """Per-lane gather from `rows` = list of nblocks [128]-rows."""
    if nblocks == 1:
        return _g128(rows[0], idx)
    hi = idx >> 7
    out = _g128(rows[0], idx)
    for k in range(1, nblocks):
        v = _g128(rows[k], idx)
        out = jnp.where(hi == k, v, out)
    return out


def _gchain_ref(row_fn, idx, nblocks):
    """Like _gchain but reads each 128-row from a VMEM ref at use time
    (row_fn(k) -> [128]) — keeps scoped-VMEM pressure flat in table size."""
    if nblocks == 1:
        return _g128(row_fn(0), idx)
    hi = idx >> 7
    out = _g128(row_fn(0), idx)
    for k in range(1, nblocks):
        v = _g128(row_fn(k), idx)
        out = jnp.where(hi == k, v, out)
    return out


def _next_after(t):
    """nextafter(t, +inf) for non-negative finite f32 via int bit bump."""
    bits = jax.lax.bitcast_convert_type(t, I32)
    return jax.lax.bitcast_convert_type(bits + 1, F32)


# --------------------------------------------------------------------------
# The nearest / occluded kernel
# --------------------------------------------------------------------------

def _make_kernel(mode: str, v: int, b: int, side: int, mside: int,
                 m3: int, nb_slot: int, nbc: int, nb_bm: int, inner: int,
                 max_outer: int, macro_pre: int = 1, count_iters: bool = False,
                 nbp: int = 0, nb_pal: int = 0, incand: bool = False,
                 ablate: tuple = ()):
    """Kernel body builder.  Static geometry:
      v volumes; b sublane rows per block; side = padded grid side;
      mside = padded brick-grid side; m3 = mside^3;
      nb_slot = ceil(v*m3/128) chain blocks for the brick->slot map;
      nbc = chain blocks for the COMPACTED occupied-brick word tables
      (descend fetches chain over occupied rows only);
      nb_bm  = ceil(ceil(v*m3/32)/128) blocks for the brick mask;
      nbp/nb_pal > 0 enables the in-kernel material fetch: 4-bit palette
      ranks per occupied brick (64 words, pal_rows0) + the [V,16] palette,
      resolved ONCE per block in the epilogue — replaces the 2M-row XLA
      take(grids_flat, gidx) (~14 ms/bounce at 1080p, PERF_NOTES.md)."""
    is_occl = mode == "occluded"
    has_pal = nbp > 0 and not is_occl
    g3 = side ** 3

    def kernel(*refs):
        if incand:
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tl_ref,
             act_ref, vtab_ref, slot_ref, comp_ref, bm_ref) = refs[:12]
            nin = 12
        else:
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tl_ref,
             act_ref, vid_ref, t0s_ref, vtab_ref, slot_ref, comp_ref,
             bm_ref) = refs[:14]
            nin = 14
        if has_pal:
            palw_ref, pal16_ref = refs[nin:nin + 2]
            nin += 2
        anyact_ref = refs[nin]  # [nblk] i32 per-block live flags (SMEM)
        nin += 1
        (hit_ref, t_ref, vol_ref, gidx_ref, nx_ref, ny_ref,
         nz_ref) = refs[nin:nin + 7]
        mat_ref = refs[nin + 7] if has_pal else None
        shape = (b, 128)
        wox, woy, woz = ox_ref[0], oy_ref[0], oz_ref[0]
        wdx, wdy, wdz = dx_ref[0], dy_ref[0], dz_ref[0]
        tl = tl_ref[0]
        ray_act = act_ref[0] != 0
        # per-block live flag, computed in XLA (one cheap segment-any) and
        # held in SMEM — an in-kernel jnp.any reduction measured
        # +1.2 ms/pass at 1080p
        any_act = anyact_ref[pl.program_id(0)] != 0

        @pl.when(jnp.logical_not(any_act))
        def _dead_block():
            # Fully-inactive block: with tile ray order, terminated rays
            # cluster, so post-bounce-1 passes see whole dead tiles — skip
            # candidate generation, the walk, and both epilogues; write the
            # exact outputs inactive lanes produce on the live path.
            hit_ref[0] = jnp.zeros(shape, I32)
            t_ref[0] = jnp.full(shape, BIG, F32)
            vol_ref[0] = jnp.full(shape, -2, I32)
            gidx_ref[0] = jnp.zeros(shape, I32)
            nx_ref[0] = jnp.zeros(shape, F32)
            ny_ref[0] = jnp.zeros(shape, F32)
            nz_ref[0] = jnp.zeros(shape, F32)
            if has_pal:
                mat_ref[0] = jnp.full(shape, MAT_NONE, I32)

        @pl.when(any_act)
        def _live_block():
            # ON-DEMAND candidate selection (recompute all V entries
            # lexicographically-after (prev_t, prev_id) under a
            # lax.cond-gated switch, instead of carrying 2xV sorted
            # entry/id arrays): bit-identical to the stable sort
            # (ascending (entry t, original id)) — but MEASURED SLOWER on
            # this chip (city V=17: 258 -> 341 ms; city-XL 1165 -> 1633):
            # the scf.if inside the while body defeats Mosaic's loop
            # scheduling more than the carried arrays cost.  Kept (and
            # interpret-parity-tested) for candidate sets too large to
            # carry; the practical page cap is 24.
            ondemand = incand and v > 24 and "cand" not in ablate
            if incand and "cand" in ablate:  # perf-ablation: fixed order, t0=0
                vid_all = [jnp.full(shape, vi, I32) for vi in range(v)]
                t0s_all = [jnp.zeros(shape, F32) for _ in range(v)]
            else:
                # Per-lane candidate entry t, IN KERNEL: the XLA preamble
                # this replaces (lax.sort over [V, N] entry keys + the
                # [V,nblk,b,128] transposes) measured 30 ms of the 40 ms
                # full-frame nearest pass at 1080p — 3x the kernel itself.
                # Entry t per volume = Cube::Intersect (scene.cpp:166-202)
                # on scalars splat from the VMEM vtab.
                def entry_t_vi(vi):
                    cvr = [vtab_ref[c, vi] for c in range(12)]
                    bxv = vtab_ref[21, vi]
                    byv = vtab_ref[22, vi]
                    bzv = vtab_ref[23, vi]
                    env = vtab_ref[26, vi]
                    rox = cvr[0] * wox + cvr[1] * woy + cvr[2] * woz + cvr[3]
                    roy = cvr[4] * wox + cvr[5] * woy + cvr[6] * woz + cvr[7]
                    roz = cvr[8] * wox + cvr[9] * woy + cvr[10] * woz + cvr[11]
                    rdxv = cvr[0] * wdx + cvr[1] * wdy + cvr[2] * wdz
                    rdyv = cvr[4] * wdx + cvr[5] * wdy + cvr[6] * wdz
                    rdzv = cvr[8] * wdx + cvr[9] * wdy + cvr[10] * wdz
                    irx, iry, irz = 1.0 / rdxv, 1.0 / rdyv, 1.0 / rdzv

                    def axis_mm(b0, oc, dc, rdc):
                        neg = dc < 0.0
                        lo = jnp.where(neg, b0 + 1.0, b0)
                        hi = jnp.where(neg, b0, b0 + 1.0)
                        return (lo - oc) * rdc, (hi - oc) * rdc

                    tnx, txx = axis_mm(bxv, rox, rdxv, irx)
                    tny, txy = axis_mm(byv, roy, rdyv, iry)
                    tnz, txz = axis_mm(bzv, roz, rdzv, irz)
                    miss = (tnx > txy) | (tny > txx)
                    e0 = jnp.maximum(tnx, tny)
                    e1 = jnp.minimum(txx, txy)
                    miss = miss | (e0 > txz) | (tnz > e1)
                    e0 = jnp.maximum(e0, tnz)
                    inside = ((rox >= bxv) & (rox <= bxv + 1.0)
                              & (roy >= byv) & (roy <= byv + 1.0)
                              & (roz >= bzv) & (roz <= bzv + 1.0))
                    t0v = jnp.where(inside, 0.0,
                                    jnp.where(miss | (e0 <= 0.0), BIG, e0))
                    t0v = jnp.where(t0v == t0v, t0v, BIG)  # NaN (axis d=0)
                    return jnp.where(env > 0.0, t0v, BIG)

            if incand and "cand" in ablate:
                pass
            elif incand and not ondemand:
                # small V: materialize + order via a bubble compare-exchange
                # network (oblivious, ADJACENT swaps only -> stable,
                # preserving the earliest-original-volume tie-break)
                ts_l = [entry_t_vi(vi) for vi in range(v)]
                id_l = [jnp.full(shape, vi, I32) for vi in range(v)]
                for i in range(v):
                    for j in range(v - 1 - i):
                        a, bb = ts_l[j], ts_l[j + 1]
                        sw = bb < a
                        ts_l[j] = jnp.where(sw, bb, a)
                        ts_l[j + 1] = jnp.where(sw, a, bb)
                        ai, bi = id_l[j], id_l[j + 1]
                        id_l[j] = jnp.where(sw, bi, ai)
                        id_l[j + 1] = jnp.where(sw, ai, bi)
                vid_all = id_l
                t0s_all = ts_l
            elif not incand:
                vid_all = vid_ref[0]     # [v, b, 128]
                t0s_all = t0s_ref[0]
            # tables are read from the VMEM refs AT USE TIME — preloading
            # all rows as values keeps V*M^3 words live across the while body
            # and blows the 16 MB scoped-VMEM budget at large V (measured:
            # city V=17 spilled to 16.16M and failed to compile)
            def slot_row(k):
                return slot_ref[0, k]

            def comp_row(w, k):
                return comp_ref[w, k]

            def bm_row(k):
                return bm_ref[0, k]

            def vconst(c, vol):
                return _g128(vtab_ref[c], vol)

            def chain_row(k_sel, arr):
                out = arr[0]
                for kk in range(1, v):
                    out = jnp.where(k_sel == kk, arr[kk], out)
                return out

            zf = jnp.zeros(shape, F32)
            zi = jnp.zeros(shape, I32)
            zb = jnp.zeros(shape, bool)

            # NOTE: boolean masks are carried as int32 — Mosaic's layout
            # inference rejects i1 vectors in while-loop carries (measured:
            # "scf.yield ... #tpu.vpad<none>" compile failure).
            state = dict(
                # candidate bookkeeping
                done=(~ray_act).astype(I32), walking=zi, level=zi,
                best_hit=zi, best_t=jnp.full(shape, BIG, F32),
                best_vol=jnp.full(shape, -2, I32), best_gidx=zi,
                # current walk: volume id + t bound.  Everything ELSE about the
                # walk (object ray, setups, step deltas, brick words) derives
                # from `vol` fresh each iteration — the candidate-switch block
                # already paid those gathers/ops every iteration, and dropping
                # the ~42 extra carried (8,128) arrays cuts the loop's VMEM
                # spill traffic (round-3 measurement: the 64-carry body ran at
                # ~0.84 us/iter vs ~0.4 us of pure VPU work).
                vol=zi, eff_tl=zf,
                # DDA positions
                t=zf, px=zi, py=zi, pz=zi, tmx=zf, tmy=zf, tmz=zf,
                mpx=zi, mpy=zi, mpz=zi, mtmx=zf, mtmy=zf, mtmz=zf,
                outer=jnp.int32(0),
            )
            if ondemand:
                state.update(prev_t=jnp.full(shape, -BIG, F32),
                             prev_id=jnp.full(shape, -1, I32))
            else:
                state.update(k=zi)
            if has_pal:
                state.update(best_slot=zi, best_bidx=zi)
            if count_iters:
                state.update(nit=zi)

            def body(st):
                st = dict(st)
                for nm in ("done", "walking", "level", "best_hit"):
                    st[nm] = st[nm] != 0
                if count_iters:
                    # per-LANE trip demand: how many outer trips until this lane
                    # is finished (drives the ray-reordering permutation;
                    # block cost = max over its lanes)
                    st["nit"] = st["nit"] + (st["walking"]
                                             | ~st["done"]).astype(I32)
                # ---- 1. candidate switch for idle lanes --------------------
                need = ~st["done"] & ~st["walking"]
                if ondemand:
                    def _select(_):
                        bt = jnp.full(shape, BIG, F32)
                        bi = jnp.full(shape, v, I32)
                        for vi in range(v):
                            t0v = entry_t_vi(vi)
                            gt_prev = ((t0v > st["prev_t"])
                                       | ((t0v == st["prev_t"])
                                          & (vi > st["prev_id"])))
                            better = gt_prev & (t0v < bt)
                            bt = jnp.where(better, t0v, bt)
                            bi = jnp.where(better, vi, bi)
                        return bt, bi

                    def _skip(_):
                        return (jnp.full(shape, BIG, F32),
                                jnp.full(shape, v, I32))

                    t0_k, vid_k = jax.lax.cond(jnp.any(need), _select,
                                               _skip, 0)
                else:
                    k = st["k"]
                    vid_k = chain_row(k, vid_all)
                    t0_k = chain_row(k, t0s_all)
                bound = jnp.minimum(tl, _next_after(st["best_t"]))
                ok = (need & (t0_k < 1e33)
                      & (t0_k <= jnp.minimum(tl, st["best_t"])))
                if not ondemand:
                    ok = ok & (k < v)
                st["done"] = st["done"] | (need & ~ok)
                if ondemand:
                    st["prev_t"] = jnp.where(ok, t0_k, st["prev_t"])
                    st["prev_id"] = jnp.where(ok, vid_k, st["prev_id"])
                else:
                    st["k"] = jnp.where(ok, k + 1, k)
                vol = jnp.where(ok, vid_k, st["vol"])
                st["vol"] = vol

                # ---- per-walk constants, fresh from `vol` (vtab rows:
                # 12 inv, 9 fwd, 3 cube, gs, ms)
                iv = [vconst(c, vol) for c in range(12)]
                bx, by, bz = vconst(21, vol), vconst(22, vol), vconst(23, vol)
                gs_f, ms_f = vconst(24, vol), vconst(25, vol)
                gs_i = gs_f.astype(I32)
                ms_i = ms_f.astype(I32)
                rox = iv[0] * wox + iv[1] * woy + iv[2] * woz + iv[3]
                roy = iv[4] * wox + iv[5] * woy + iv[6] * woz + iv[7]
                roz = iv[8] * wox + iv[9] * woy + iv[10] * woz + iv[11]
                rdx = iv[0] * wdx + iv[1] * wdy + iv[2] * wdz
                rdy = iv[4] * wdx + iv[5] * wdy + iv[6] * wdz
                rdz = iv[8] * wdx + iv[9] * wdy + iv[10] * wdz
                r = dict(ox=rox, oy=roy, oz=roz, dx=rdx, dy=rdy, dz=rdz,
                         rdx=1.0 / rdx, rdy=1.0 / rdy, rdz=1.0 / rdz,
                         sx=jnp.signbit(rdx).astype(F32),
                         sy=jnp.signbit(rdy).astype(F32),
                         sz=jnp.signbit(rdz).astype(F32))

                # macro + fine Setup3DDDA (only `start` lanes adopt positions;
                # deltas/steps are pure functions of the walk -> used directly)
                sm = _setup(r, bx, by, bz, ms_f, ms_i)
                s_f = _setup(r, bx, by, bz, gs_f, gs_i)
                stx, sty, stz = sm["stx"], sm["sty"], sm["stz"]
                start = ok & sm["valid"] & (sm["t0"] < bound)
                st["walking"] = st["walking"] | start
                st["level"] = st["level"] & ~start
                st["eff_tl"] = jnp.where(ok, bound, st["eff_tl"])
                st["t"] = jnp.where(start, sm["t0"], st["t"])
                for nm, val in (("mpx", sm["px"]), ("mpy", sm["py"]),
                                ("mpz", sm["pz"]),
                                ("mtmx", sm["tmx"]), ("mtmy", sm["tmy"]),
                                ("mtmz", sm["tmz"])):
                    st[nm] = jnp.where(start, val, st[nm])

                # ---- 1.5 multi-step empty-brick skipping: rays in open space
                # advance several macro cells per outer iteration (each extra
                # step is ~35 VPU ops + one lane gather vs a whole descend +
                # fine-step block per iteration otherwise)
                for _ in range(macro_pre):
                    at_m0 = st["walking"] & ~st["level"]
                    midx0 = (st["mpx"] * mside + st["mpy"]) * mside + st["mpz"]
                    grow0 = st["vol"] * m3 + midx0
                    bmw0 = _gchain_ref(bm_row, grow0 >> 5, nb_bm)
                    empty = at_m0 & ((jnp.right_shift(bmw0, grow0 & 31) & 1)
                                     == 0)
                    mtmx0, mtmy0, mtmz0 = st["mtmx"], st["mtmy"], st["mtmz"]
                    first0 = mtmx0 < mtmy0
                    mx0 = first0 & (mtmx0 < mtmz0)
                    my0 = (~first0) & (mtmy0 < mtmz0)
                    mz0 = ~(mx0 | my0)
                    mt0 = jnp.where(mx0, mtmx0, jnp.where(my0, mtmy0, mtmz0))
                    st["mpx"] = st["mpx"] + jnp.where(empty & mx0, stx, 0)
                    st["mpy"] = st["mpy"] + jnp.where(empty & my0, sty, 0)
                    st["mpz"] = st["mpz"] + jnp.where(empty & mz0, stz, 0)
                    mmoved0 = jnp.where(mx0, st["mpx"],
                                        jnp.where(my0, st["mpy"], st["mpz"]))
                    m_out0 = (mmoved0 < 0) | (mmoved0 >= ms_i)
                    st["mtmx"] = mtmx0 + jnp.where(empty & mx0, sm["tdx"], 0.0)
                    st["mtmy"] = mtmy0 + jnp.where(empty & my0, sm["tdy"], 0.0)
                    st["mtmz"] = mtmz0 + jnp.where(empty & mz0, sm["tdz"], 0.0)
                    st["t"] = jnp.where(empty, mt0, st["t"])
                    ended0 = empty & (m_out0 | ~(mt0 < st["eff_tl"]))
                    st["walking"] = st["walking"] & ~ended0

                # ---- 2. brick-mask test: descend or skip -------------------
                at_m = st["walking"] & ~st["level"]
                midx = (st["mpx"] * mside + st["mpy"]) * mside + st["mpz"]
                grow = st["vol"] * m3 + midx
                bmw = _gchain_ref(bm_row, grow >> 5, nb_bm)
                occ_bit = (jnp.right_shift(bmw, grow & 31) & 1) == 1
                descend = at_m & occ_bit
                skip = at_m & ~occ_bit

                # ---- 3. descend: fetch the brick's 512 bits + seed fine ----
                # two-level fetch: brick -> compact slot (occupied rows only),
                # then 16 words chained over the COMPACT table — ~3x (monu) to
                # ~8x (city) fewer chain blocks than the dense row space.
                # Fetched FRESH each iteration (no carry): a lane mid-brick
                # keeps the same mpx, so the fetch reproduces its words.
                slot = _gchain_ref(slot_row, grow, nb_slot)
                words = [_gchain_ref(lambda k, j=j: comp_row(j, k), slot, nbc)
                         for j in range(16)]

                cellw = 1.0 / gs_f

                def fine_init_axis(oc, dc, rdc, sc, b0, t):
                    pos = gs_f * ((oc - b0) + (t + 5e-5) * dc)
                    pln = (jnp.ceil(pos) - sc) * cellw
                    p = jnp.clip(pos.astype(I32), 0, gs_i - 1)
                    tm = (pln - (oc - b0)) * rdc
                    return p, tm

                fpx, ftmx = fine_init_axis(r["ox"], r["dx"], r["rdx"], r["sx"],
                                           bx, st["t"])
                fpy, ftmy = fine_init_axis(r["oy"], r["dy"], r["rdy"], r["sy"],
                                           by, st["t"])
                fpz, ftmz = fine_init_axis(r["oz"], r["dz"], r["rdz"], r["sz"],
                                           bz, st["t"])
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

                # ---- 4. gather-free fine steps ------------------------------
                act_f = st["walking"] & (st["level"] | descend)
                t = st["t"]
                hit = zb
                hit_t = zf
                hit_gidx = zi
                hit_slot = zi
                hit_bidx = zi
                go_macro = zb
                eff_tl = st["eff_tl"]
                for _ in range(inner):
                    bidx = ((px - blox) * 8 + (py - bloy)) * 8 + (pz - bloz)
                    word = _tree16(words, bidx >> 5)
                    bit = (jnp.right_shift(word, bidx & 31) & 1) == 1
                    pred = act_f & bit & (t < eff_tl)
                    hit = hit | pred
                    hit_t = jnp.where(pred, t, hit_t)
                    hit_gidx = jnp.where(
                        pred, st["vol"] * g3 + (px * side + py) * side + pz,
                        hit_gidx)
                    if has_pal:
                        hit_slot = jnp.where(pred, slot, hit_slot)
                        hit_bidx = jnp.where(pred, bidx, hit_bidx)
                    act_f = act_f & ~pred

                    first = tmx < tmy
                    use_x = first & (tmx < tmz)
                    use_y = (~first) & (tmy < tmz)
                    use_z = ~(use_x | use_y)
                    t_new = jnp.where(use_x, tmx, jnp.where(use_y, tmy, tmz))
                    px = px + jnp.where(act_f & use_x, stx, 0)
                    py = py + jnp.where(act_f & use_y, sty, 0)
                    pz = pz + jnp.where(act_f & use_z, stz, 0)
                    moved = jnp.where(use_x, px, jnp.where(use_y, py, pz))
                    out_grid = (moved < 0) | (moved >= gs_i)
                    blo = jnp.where(use_x, blox, jnp.where(use_y, bloy, bloz))
                    out_brick = (moved < blo) | (moved >= blo + BRICK)
                    tmx = tmx + jnp.where(act_f & use_x, s_f["tdx"], 0.0)
                    tmy = tmy + jnp.where(act_f & use_y, s_f["tdy"], 0.0)
                    tmz = tmz + jnp.where(act_f & use_z, s_f["tdz"], 0.0)
                    t = jnp.where(act_f, t_new, t)
                    act_f = act_f & (t_new < eff_tl)
                    leave = act_f & out_brick & ~out_grid
                    go_macro = go_macro | leave
                    act_f = act_f & ~out_grid & ~out_brick

                was_fine = st["level"] | descend
                st["px"], st["py"], st["pz"] = px, py, pz
                st["tmx"], st["tmy"], st["tmz"] = tmx, tmy, tmz
                st["level"] = was_fine & act_f

                # ---- 5. macro advance: skips + fine walks that left --------
                do_m = skip | go_macro
                mtmx, mtmy, mtmz = st["mtmx"], st["mtmy"], st["mtmz"]
                first = mtmx < mtmy
                mx = first & (mtmx < mtmz)
                my = (~first) & (mtmy < mtmz)
                mz = ~(mx | my)
                mt_new = jnp.where(mx, mtmx, jnp.where(my, mtmy, mtmz))
                st["mpx"] = st["mpx"] + jnp.where(do_m & mx, stx, 0)
                st["mpy"] = st["mpy"] + jnp.where(do_m & my, sty, 0)
                st["mpz"] = st["mpz"] + jnp.where(do_m & mz, stz, 0)
                mmoved = jnp.where(mx, st["mpx"], jnp.where(my, st["mpy"],
                                                            st["mpz"]))
                m_out = (mmoved < 0) | (mmoved >= ms_i)
                st["mtmx"] = mtmx + jnp.where(do_m & mx, sm["tdx"], 0.0)
                st["mtmy"] = mtmy + jnp.where(do_m & my, sm["tdy"], 0.0)
                st["mtmz"] = mtmz + jnp.where(do_m & mz, sm["tdz"], 0.0)
                st["t"] = jnp.where(do_m, mt_new, t)
                macro_end = do_m & (m_out | ~(mt_new < eff_tl))

                # walk continues if: fine lanes still stepping, or handing to
                # macro (go_macro), or macro lanes that stepped in-bounds
                fine_ended = was_fine & ~act_f & ~go_macro
                st["walking"] = st["walking"] & ~fine_ended & ~macro_end

                # ---- 6. merge this iteration's hits into the per-ray best --
                if is_occl:
                    st["best_hit"] = st["best_hit"] | hit
                    st["done"] = st["done"] | hit
                else:
                    better = hit & (~st["best_hit"] | (hit_t < st["best_t"])
                                    | ((hit_t == st["best_t"])
                                       & (st["vol"] < st["best_vol"])))
                    st["best_hit"] = st["best_hit"] | better
                    st["best_t"] = jnp.where(better, hit_t, st["best_t"])
                    st["best_vol"] = jnp.where(better, st["vol"], st["best_vol"])
                    st["best_gidx"] = jnp.where(better, hit_gidx,
                                                st["best_gidx"])
                    if has_pal:
                        st["best_slot"] = jnp.where(better, hit_slot,
                                                    st["best_slot"])
                        st["best_bidx"] = jnp.where(better, hit_bidx,
                                                    st["best_bidx"])

                st["outer"] = st["outer"] + 1
                for nm in ("done", "walking", "level", "best_hit"):
                    st[nm] = st[nm].astype(I32)
                return st

            def cond(st):
                return jnp.any((st["done"] == 0) | (st["walking"] != 0)) & (
                    st["outer"] < max_outer)

            st = jax.lax.while_loop(cond, body, state)
            st = dict(st)
            st["best_hit"] = st["best_hit"] != 0

            if is_occl:
                hit_ref[0] = st["best_hit"].astype(I32)
                t_ref[0] = st["best_t"]
                vol_ref[0] = st["best_vol"]
                gidx_ref[0] = st["best_gidx"]
                nx_ref[0] = jnp.zeros(shape, F32)
                ny_ref[0] = jnp.zeros(shape, F32)
                nz_ref[0] = jnp.zeros(shape, F32)
                return

            # ---- normals for the winning volume (GetNormalVoxel,
            # scene.cpp:121-148) — once, after the loop --------------------
            if "norm" in ablate:  # perf-ablation mode: skip the epilogue
                h = st["best_hit"]
                hit_ref[0] = h.astype(I32)
                t_ref[0] = jnp.where(h, st["best_t"], BIG)
                vol_ref[0] = jnp.where(h, st["best_vol"], -2)
                gidx_ref[0] = st["best_gidx"]
                if has_pal:
                    mat_ref[0] = jnp.zeros(shape, I32)
                nx_ref[0] = jnp.zeros(shape, F32)
                ny_ref[0] = jnp.zeros(shape, F32)
                nz_ref[0] = jnp.zeros(shape, F32)
                return
            volw = jnp.maximum(st["best_vol"], 0)
            iv = [vconst(c, volw) for c in range(12)]
            fw = [vconst(12 + c, volw) for c in range(9)]
            gs_f = vconst(24, volw)
            rox = iv[0] * wox + iv[1] * woy + iv[2] * woz + iv[3]
            roy = iv[4] * wox + iv[5] * woy + iv[6] * woz + iv[7]
            roz = iv[8] * wox + iv[9] * woy + iv[10] * woz + iv[11]
            rdx = iv[0] * wdx + iv[1] * wdy + iv[2] * wdz
            rdy = iv[4] * wdx + iv[5] * wdy + iv[6] * wdz
            rdz = iv[8] * wdx + iv[9] * wdy + iv[10] * wdz
            t = st["best_t"]

            def frac(o, dc):
                i1 = (o + t * dc) * gs_f
                fg = i1 - jnp.floor(i1)
                return jnp.minimum(fg, 1.0 - fg)

            ddx, ddy, ddz = frac(rox, rdx), frac(roy, rdy), frac(roz, rdz)
            mind = jnp.minimum(ddx, jnp.minimum(ddy, ddz))
            nx = jnp.where(ddx == mind,
                           jnp.signbit(rdx).astype(F32) * 2.0 - 1.0, 0.0)
            ny = jnp.where(ddy == mind,
                           jnp.signbit(rdy).astype(F32) * 2.0 - 1.0, 0.0)
            nz = jnp.where(ddz == mind,
                           jnp.signbit(rdz).astype(F32) * 2.0 - 1.0, 0.0)
            wx = fw[0] * nx + fw[1] * ny + fw[2] * nz
            wy = fw[3] * nx + fw[4] * ny + fw[5] * nz
            wz = fw[6] * nx + fw[7] * ny + fw[8] * nz
            inv_len = jax.lax.rsqrt(jnp.maximum(wx * wx + wy * wy + wz * wz,
                                                1e-20))
            h = st["best_hit"]
            hit_ref[0] = h.astype(I32)
            t_ref[0] = jnp.where(h, st["best_t"], BIG)
            vol_ref[0] = jnp.where(h, st["best_vol"], -2)
            # count_iters: perf instrumentation — report each LANE's trip demand
            # (the block pays the max over its lanes; argsorting this key is the
            # ray-reordering permutation) instead of cell ids
            # (with has_pal: the recorded slot/bidx pair, for parity debugging)
            if count_iters:
                gidx_ref[0] = (st["best_slot"] * 512 + st["best_bidx"]
                               if has_pal else st["nit"])
            else:
                gidx_ref[0] = st["best_gidx"]

            if has_pal and "pal" in ablate:  # perf-ablation mode
                mat_ref[0] = jnp.zeros(shape, I32)
            elif has_pal:
                # material fetch, ONCE per block: palette-rank word of the hit
                # cell (64 static-word gathers over the compacted slot chain),
                # then the [V,16] palette row
                slot_h = st["best_slot"]
                bidx_h = st["best_bidx"]
                widx = bidx_h >> 3
                w = jnp.zeros(shape, I32)
                for j in range(64):
                    wj = _gchain_ref(lambda kk, j=j: palw_ref[j, kk], slot_h,
                                     nbp)
                    w = jnp.where(widx == j, wj, w)
                rank = jnp.right_shift(w, 4 * (bidx_h & 7)) & 15
                pidx = jnp.maximum(st["best_vol"], 0) * 16 + rank
                matv = _gchain_ref(lambda kk: pal16_ref[0, kk], pidx, nb_pal)
                mat_ref[0] = jnp.where(h, matv, MAT_NONE)
            nx_ref[0] = jnp.where(h, wx * inv_len, 0.0)
            ny_ref[0] = jnp.where(h, wy * inv_len, 0.0)
            nz_ref[0] = jnp.where(h, wz * inv_len, 0.0)

    return kernel


# --------------------------------------------------------------------------
# The material-exit kernel (FindMaterialExit / FindSmokeExit,
# scene.cpp:875-1006): march THROUGH the ray's own medium until a
# leave-predicate cell (occ planes OCC_EXIT_*) or the grid boundary.
# One fixed volume per lane -> object ray + DDA setup hoist out of the loop.
# --------------------------------------------------------------------------

def _make_exit_kernel(v: int, b: int, side: int, mside: int, m3: int,
                      nb_occ: int, nb_bm: int, inner: int, max_outer: int):
    g3 = side ** 3

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, act_ref,
               vol_ref_in, pln_ref, vtab_ref, occw_ref, bm_ref, anyact_ref,
               iv_ref, t_ref, gidx_ref, nx_ref, ny_ref, nz_ref):
        shape = (b, 128)
        wox, woy, woz = ox_ref[0], oy_ref[0], oz_ref[0]
        wdx, wdy, wdz = dx_ref[0], dy_ref[0], dz_ref[0]
        ray_act = act_ref[0] != 0
        any_act = anyact_ref[pl.program_id(0)] != 0  # XLA per-block flag
        shape0 = (b, 128)

        @pl.when(jnp.logical_not(any_act))
        def _dead_block():
            # no lane of this block marches a medium this bounce: skip the
            # setup + walk + normals; masked callers never read these lanes
            iv_ref[0] = jnp.zeros(shape0, I32)
            t_ref[0] = jnp.zeros(shape0, F32)
            gidx_ref[0] = jnp.zeros(shape0, I32)
            nx_ref[0] = jnp.zeros(shape0, F32)
            ny_ref[0] = jnp.zeros(shape0, F32)
            nz_ref[0] = jnp.zeros(shape0, F32)

        @pl.when(any_act)
        def _live_block():
            vol = jnp.clip(vol_ref_in[0], 0, v - 1)
            plane_sel = pln_ref[0]  # 0 = glass plane, 1 = smoke plane
            def occ_row(w, k):
                return occw_ref[w, k]

            def bm_row(k):
                return bm_ref[0, k]

            def vconst(c, volx):
                return _g128(vtab_ref[c], volx)

            # object-space ray + setups (hoisted: one volume per lane)
            iv = [vconst(c, vol) for c in range(12)]
            bx, by, bz = vconst(21, vol), vconst(22, vol), vconst(23, vol)
            gs_f, ms_f = vconst(24, vol), vconst(25, vol)
            rox = iv[0] * wox + iv[1] * woy + iv[2] * woz + iv[3]
            roy = iv[4] * wox + iv[5] * woy + iv[6] * woz + iv[7]
            roz = iv[8] * wox + iv[9] * woy + iv[10] * woz + iv[11]
            rdx = iv[0] * wdx + iv[1] * wdy + iv[2] * wdz
            rdy = iv[4] * wdx + iv[5] * wdy + iv[6] * wdz
            rdz = iv[8] * wdx + iv[9] * wdy + iv[10] * wdz
            r = dict(ox=rox, oy=roy, oz=roz, dx=rdx, dy=rdy, dz=rdz,
                     rdx=1.0 / rdx, rdy=1.0 / rdy, rdz=1.0 / rdz,
                     sx=jnp.signbit(rdx).astype(F32),
                     sy=jnp.signbit(rdy).astype(F32),
                     sz=jnp.signbit(rdz).astype(F32))
            gs_i = gs_f.astype(I32)
            ms_i = ms_f.astype(I32)
            sm = _setup(r, bx, by, bz, ms_f, ms_i)
            s_f = _setup(r, bx, by, bz, gs_f, gs_i)
            valid = sm["valid"]
            t0 = sm["t0"]
            row_base = plane_sel * (v * m3) + vol * m3
            cellw = 1.0 / gs_f

            zf = jnp.zeros(shape, F32)
            zi = jnp.zeros(shape, I32)
            state = dict(
                walking=(ray_act & valid).astype(I32), level=zi,
                in_vol=zi, gidx=zi,
                t=t0, t_out=jnp.where(valid, t0, 0.0),
                px=zi, py=zi, pz=zi, tmx=zf, tmy=zf, tmz=zf,
                mpx=sm["px"], mpy=sm["py"], mpz=sm["pz"],
                mtmx=sm["tmx"], mtmy=sm["tmy"], mtmz=sm["tmz"],
                outer=jnp.int32(0),
            )

            def fine_init_axis(oc, dc, rdc, sc, b0, t):
                pos = gs_f * ((oc - b0) + (t + 5e-5) * dc)
                pln = (jnp.ceil(pos) - sc) * cellw
                p = jnp.clip(pos.astype(I32), 0, gs_i - 1)
                tm = (pln - (oc - b0)) * rdc
                return p, tm

            def body(st):
                st = dict(st)
                walking = st["walking"] != 0
                level = st["level"] != 0

                # ---- brick-mask test
                at_m = walking & ~level
                midx = (st["mpx"] * mside + st["mpy"]) * mside + st["mpz"]
                grow = row_base + midx
                bmw = _gchain_ref(bm_row, grow >> 5, nb_bm)
                occ_bit = (jnp.right_shift(bmw, grow & 31) & 1) == 1
                descend = at_m & occ_bit
                skip = at_m & ~occ_bit

                # ---- descend: fetch + seed fine (fetched fresh each
                # iteration — a lane mid-brick keeps the same mpx, so the
                # fetch reproduces its words; no carried copies)
                words = [_gchain_ref(lambda k, j=j: occ_row(j, k), grow, nb_occ)
                         for j in range(16)]
                fpx, ftmx = fine_init_axis(r["ox"], r["dx"], r["rdx"], r["sx"],
                                           bx, st["t"])
                fpy, ftmy = fine_init_axis(r["oy"], r["dy"], r["rdy"], r["sy"],
                                           by, st["t"])
                fpz, ftmz = fine_init_axis(r["oz"], r["dz"], r["rdz"], r["sz"],
                                           bz, st["t"])
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

                # ---- fine steps: leave at the first set bit (material exit)
                act_f = walking & (level | descend)
                t = st["t"]
                t_out = st["t_out"]
                in_vol = st["in_vol"] != 0
                gidx = st["gidx"]
                go_macro = jnp.zeros(shape, bool)
                for _ in range(inner):
                    bidx = ((px - blox) * 8 + (py - bloy)) * 8 + (pz - bloz)
                    word = _tree16(words, bidx >> 5)
                    bit = (jnp.right_shift(word, bidx & 31) & 1) == 1
                    pred = act_f & bit
                    in_vol = in_vol | pred
                    t_out = jnp.where(pred, t, t_out)
                    gidx = jnp.where(
                        pred, vol * g3 + (px * side + py) * side + pz, gidx)
                    act_f = act_f & ~pred

                    first = tmx < tmy
                    use_x = first & (tmx < tmz)
                    use_y = (~first) & (tmy < tmz)
                    use_z = ~(use_x | use_y)
                    t_new = jnp.where(use_x, tmx, jnp.where(use_y, tmy, tmz))
                    px = px + jnp.where(act_f & use_x, sm["stx"], 0)
                    py = py + jnp.where(act_f & use_y, sm["sty"], 0)
                    pz = pz + jnp.where(act_f & use_z, sm["stz"], 0)
                    moved = jnp.where(use_x, px, jnp.where(use_y, py, pz))
                    out_grid = (moved < 0) | (moved >= gs_i)
                    blo = jnp.where(use_x, blox, jnp.where(use_y, bloy, bloz))
                    out_brick = (moved < blo) | (moved >= blo + BRICK)
                    tmx = tmx + jnp.where(act_f & use_x, s_f["tdx"], 0.0)
                    tmy = tmy + jnp.where(act_f & use_y, s_f["tdy"], 0.0)
                    tmz = tmz + jnp.where(act_f & use_z, s_f["tdz"], 0.0)
                    t = jnp.where(act_f, t_new, t)
                    t_out = jnp.where(act_f & out_grid, t_new, t_out)
                    leave = act_f & out_brick & ~out_grid
                    go_macro = go_macro | leave
                    act_f = act_f & ~out_grid & ~out_brick

                was_fine = level | descend
                st["px"], st["py"], st["pz"] = px, py, pz
                st["tmx"], st["tmy"], st["tmz"] = tmx, tmy, tmz
                level = was_fine & act_f

                # ---- macro advance
                do_m = skip | go_macro
                mtmx, mtmy, mtmz = st["mtmx"], st["mtmy"], st["mtmz"]
                first = mtmx < mtmy
                mx = first & (mtmx < mtmz)
                my = (~first) & (mtmy < mtmz)
                mz = ~(mx | my)
                mt_new = jnp.where(mx, mtmx, jnp.where(my, mtmy, mtmz))
                st["mpx"] = st["mpx"] + jnp.where(do_m & mx, sm["stx"], 0)
                st["mpy"] = st["mpy"] + jnp.where(do_m & my, sm["sty"], 0)
                st["mpz"] = st["mpz"] + jnp.where(do_m & mz, sm["stz"], 0)
                mmoved = jnp.where(mx, st["mpx"], jnp.where(my, st["mpy"],
                                                            st["mpz"]))
                m_out = (mmoved < 0) | (mmoved >= ms_i)
                st["mtmx"] = mtmx + jnp.where(do_m & mx, sm["tdx"], 0.0)
                st["mtmy"] = mtmy + jnp.where(do_m & my, sm["tdy"], 0.0)
                st["mtmz"] = mtmz + jnp.where(do_m & mz, sm["tdz"], 0.0)
                t = jnp.where(do_m, mt_new, t)
                t_out = jnp.where(do_m & m_out, mt_new, t_out)
                st["t"] = t
                st["t_out"] = t_out

                fine_ended = was_fine & ~act_f & ~go_macro
                macro_end = do_m & m_out
                walking = walking & ~fine_ended & ~macro_end
                st["walking"] = walking.astype(I32)
                st["level"] = level.astype(I32)
                st["in_vol"] = in_vol.astype(I32)
                st["gidx"] = gidx
                st["outer"] = st["outer"] + 1
                return st

            def cond(st):
                return jnp.any(st["walking"] != 0) & (st["outer"] < max_outer)

            st = jax.lax.while_loop(cond, body, state)

            # normals at t_out (GetNormalVoxel) — r is already per-lane
            t = st["t_out"]

            def frac(o, dc):
                i1 = (o + t * dc) * gs_f
                fg = i1 - jnp.floor(i1)
                return jnp.minimum(fg, 1.0 - fg)

            ddx, ddy, ddz = frac(rox, rdx), frac(roy, rdy), frac(roz, rdz)
            mind = jnp.minimum(ddx, jnp.minimum(ddy, ddz))
            nx = jnp.where(ddx == mind, r["sx"] * 2.0 - 1.0, 0.0)
            ny = jnp.where(ddy == mind, r["sy"] * 2.0 - 1.0, 0.0)
            nz = jnp.where(ddz == mind, r["sz"] * 2.0 - 1.0, 0.0)
            fw = [vconst(12 + c, vol) for c in range(9)]
            wx = fw[0] * nx + fw[1] * ny + fw[2] * nz
            wy = fw[3] * nx + fw[4] * ny + fw[5] * nz
            wz = fw[6] * nx + fw[7] * ny + fw[8] * nz
            inv_len = jax.lax.rsqrt(jnp.maximum(wx * wx + wy * wy + wz * wz,
                                                1e-20))
            ivm = st["in_vol"] != 0
            iv_ref[0] = st["in_vol"]
            t_ref[0] = st["t_out"]
            gidx_ref[0] = st["gidx"]
            nx_ref[0] = jnp.where(ivm, wx * inv_len, 0.0)
            ny_ref[0] = jnp.where(ivm, wy * inv_len, 0.0)
            nz_ref[0] = jnp.where(ivm, wz * inv_len, 0.0)

    return kernel


@partial(jax.jit, static_argnames=("max_outer", "inner", "block_rows",
                                   "interpret"))
def exit_pallas(grids_flat, gridsize, inv, fwd, cube_min, o, d,
                ray_active, mode_code, vol_match, occ, bricksize,
                max_outer=4096, inner=INNER, block_rows=8, interpret=None):
    """Pallas material-exit march, drop-in for dda_occ.traverse_occ
    mode="exit".  Returns dict(in_vol, t, cell, nx, ny, nz)."""
    from voxtracer.kernels.dda import EXIT_SMOKE

    if interpret is None:
        interpret = not _on_tpu()
    v = gridsize.shape[0]
    n = o.shape[0]
    g3 = grids_flat.shape[0] // v
    side = round(g3 ** (1.0 / 3.0))
    m3 = occ.shape[2]
    mside = round(m3 ** (1.0 / 3.0))

    # stack BOTH exit planes: rows [2*V*M3, 16], glass first
    occ2 = jnp.concatenate([occ[1], occ[2]], axis=0).reshape(2 * v * m3, 16)
    rows = _pad_to(occ2, 128, axis=0)
    nb_occ = rows.shape[0] // 128
    occw = rows.T.reshape(16, nb_occ, 128)
    nz = jnp.any(occ2 != 0, axis=1).astype(jnp.int32)
    nz = _pad_to(nz, 32 * 128, axis=0)
    shifts = jnp.left_shift(nz.reshape(-1, 32),
                            jnp.arange(32, dtype=jnp.int32)[None, :])
    bmw = _pad_to(shifts.sum(axis=1).astype(jnp.int32), 128, axis=0)
    nb_bm = bmw.shape[0] // 128
    bm = bmw.reshape(1, nb_bm, 128)

    vtab = jnp.concatenate([
        inv[:, :3, :].reshape(v, 12),
        fwd[:, :3, :3].reshape(v, 9),
        cube_min,
        gridsize.astype(F32)[:, None],
        bricksize.astype(F32)[:, None],
    ], axis=1).T
    vtab = _pad_to(vtab, 128, axis=1)

    blk = block_rows * 128
    npad = -(-n // blk) * blk
    nblk = npad // blk

    def rays2d(x, fill=0):
        return _pad_to(x, blk, axis=0, fill=fill).reshape(nblk, block_rows,
                                                          128)

    plane_sel = (mode_code == EXIT_SMOKE).astype(I32)
    actp = _pad_to(ray_active.astype(I32), blk, axis=0)
    blk_live = jnp.any(actp.reshape(nblk, blk) != 0, axis=1).astype(I32)
    ins = [rays2d(o[:, 0]), rays2d(o[:, 1]), rays2d(o[:, 2]),
           rays2d(d[:, 0]), rays2d(d[:, 1]), rays2d(d[:, 2]),
           rays2d(ray_active.astype(I32)), rays2d(vol_match),
           rays2d(plane_sel), vtab, occw, bm, blk_live]

    ray_spec = pl.BlockSpec((1, block_rows, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def full(x):
        nd = x.ndim
        return pl.BlockSpec(x.shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    kernel = _make_exit_kernel(v, block_rows, side, mside, m3, nb_occ,
                               nb_bm, inner, max_outer)
    out_shapes = [jax.ShapeDtypeStruct((nblk, block_rows, 128), dt)
                  for dt in (I32, F32, I32, F32, F32, F32)]
    outs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[ray_spec] * 9 + [full(vtab), full(occw), full(bm),
                  pl.BlockSpec((nblk,), lambda i: (0,),
                               memory_space=pltpu.SMEM)],
        out_specs=[ray_spec] * 6,
        out_shape=out_shapes,
        interpret=interpret,
    )(*ins)

    iv, t, gidx, nx, ny, nz = [x.reshape(npad)[:n] for x in outs]
    sg = jax.lax.stop_gradient
    in_v = iv != 0
    cell = jnp.take(grids_flat, gidx, mode="clip")
    return dict(
        in_vol=sg(in_v),
        t=sg(t),
        cell=sg(jnp.where(in_v, cell, MAT_NONE)),
        nx=sg(nx), ny=sg(ny), nz=sg(nz),
    )


def _pad_to(x, m, axis=0, fill=0):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def _prep_tables(gridsize, inv, fwd, cube_min, occ, bricksize, plane,
                 occ_slot=None, occ_rows0=None):
    """Pack per-volume constants + occupancy into kernel VMEM tables.

    With occ_slot/occ_rows0 (host-compacted occupied-brick rows,
    scene/instances.py) the descend word tables chain over occupied rows
    only; otherwise the slot map is the identity over the dense space."""
    v = gridsize.shape[0]
    m3 = occ.shape[2]
    # vtab [26, 128]: 12 inv rows, 9 fwd rows, 3 cube_min, gs_f, ms_f
    vtab = jnp.concatenate([
        inv[:, :3, :].reshape(v, 12),
        fwd[:, :3, :3].reshape(v, 9),
        cube_min,
        gridsize.astype(F32)[:, None],
        bricksize.astype(F32)[:, None],
    ], axis=1).T  # [26, V]
    vtab = _pad_to(vtab, 128, axis=1)

    occp = occ[plane].reshape(v * m3, 16)  # [V*M3, 16]
    if occ_rows0 is not None and plane == OCC_ANY:
        slot_flat = occ_slot.reshape(-1)
        comp_rows = occ_rows0
    else:
        slot_flat = jnp.arange(v * m3, dtype=I32)
        comp_rows = _pad_to(occp, 128, axis=0)
    slot_flat = _pad_to(slot_flat, 128, axis=0)
    nb_slot = slot_flat.shape[0] // 128
    slot = slot_flat.reshape(1, nb_slot, 128)
    nbc = comp_rows.shape[0] // 128
    comp = comp_rows.T.reshape(16, nbc, 128)

    # brick-occupied bitmask: bit (vol*m3+brick) set iff any cell word != 0
    nz = jnp.any(occp != 0, axis=1).astype(jnp.int32)  # [V*M3]
    nz = _pad_to(nz, 32 * 128, axis=0)
    shifts = jnp.left_shift(nz.reshape(-1, 32),
                            jnp.arange(32, dtype=jnp.int32)[None, :])
    bmw = shifts.sum(axis=1).astype(jnp.int32)
    bmw = _pad_to(bmw, 128, axis=0)
    nb_bm = bmw.shape[0] // 128
    bm = bmw.reshape(1, nb_bm, 128)
    return vtab, slot, nb_slot, comp, nbc, bm, nb_bm


@partial(jax.jit, static_argnames=("mode", "max_outer", "inner",
                                   "block_rows", "interpret", "macro_pre",
                                   "count_iters", "ablate"))
def traverse_pallas(grids_flat, gridsize, inv, fwd, cube_min, o, d, t_limit,
                    ray_active, vol_enabled, occ, bricksize,
                    mode="nearest", max_outer=4096, inner=INNER,
                    block_rows=8, interpret=None,
                    macro_pre=2, occ_slot=None, occ_rows0=None,
                    count_iters=False, pal=None, pal_rows0=None,
                    ablate=()):
    """Pallas traversal, drop-in for dda_occ.traverse_occ_topk
    (modes nearest / occluded).  Returns the same per-ray dicts.

    pal/pal_rows0 (scene/instances.py build_palette_rows): hit materials
    resolve inside the kernel; without them the nearest post-pass pays the
    XLA take(grids_flat, gidx) HBM gather."""
    assert mode in ("nearest", "occluded")
    if interpret is None:
        interpret = not _on_tpu()
    v = gridsize.shape[0]
    n = o.shape[0]
    g3 = grids_flat.shape[0] // v
    side = round(g3 ** (1.0 / 3.0))
    m3 = occ.shape[2]
    mside = round(m3 ** (1.0 / 3.0))
    # pal_rows0 lives in the COMPACTED slot space — palette mode requires
    # the compacted descend tables (occ_slot/occ_rows0) so both use the
    # same slot ids
    has_pal = (pal is not None and pal_rows0 is not None
               and occ_rows0 is not None and mode == "nearest")

    vtab, slot, nb_slot, comp, nbc, bm, nb_bm = _prep_tables(
        gridsize, inv, fwd, cube_min, occ, bricksize, OCC_ANY,
        occ_slot=occ_slot, occ_rows0=occ_rows0)
    nbp = nb_pal = 0
    if has_pal:
        nbp = pal_rows0.shape[0] // 128
        palw = pal_rows0.T.reshape(64, nbp, 128)
        pal_flat = _pad_to(pal.reshape(-1).astype(I32), 128, axis=0,
                           fill=MAT_NONE)
        nb_pal = pal_flat.shape[0] // 128
        pal16 = pal_flat.reshape(1, nb_pal, 128)

    # candidate ordering: the entry-t computation AND the stable ordering
    # happen IN KERNEL (incand) — the XLA lax.sort + [V,nblk,b,128]
    # transpose preamble this replaced measured 30 ms of the 40 ms
    # full-frame nearest pass at 1080p.  vol_enabled rides as vtab row 26.
    # (The non-incand branch fed by the TLAS candidate mask was removed
    # with the TLAS — PERF_NOTES round-5 obituary.)
    incand = True
    vtab = jnp.concatenate(
        [vtab, _pad_to(vol_enabled.astype(F32), 128)[None, :]], axis=0)

    blk = block_rows * 128
    npad = -(-n // blk) * blk
    nblk = npad // blk

    def rays2d(x, fill=0):
        return _pad_to(x, blk, axis=0, fill=fill).reshape(nblk, block_rows,
                                                          128)

    ins = [rays2d(o[:, 0]), rays2d(o[:, 1]), rays2d(o[:, 2]),
           rays2d(d[:, 0]), rays2d(d[:, 1]), rays2d(d[:, 2]),
           rays2d(t_limit, BIG), rays2d(ray_active.astype(I32))]
    ins += [vtab, slot, comp, bm]
    if has_pal:
        ins += [palw, pal16]

    ray_spec = pl.BlockSpec((1, block_rows, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def full(x):
        nd = x.ndim
        return pl.BlockSpec(x.shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel(mode, v, block_rows, side, mside, m3, nb_slot,
                          nbc, nb_bm, inner, max_outer, macro_pre,
                          count_iters, nbp=nbp, nb_pal=nb_pal,
                          incand=incand, ablate=ablate)

    # per-block live flag: one XLA segment-any over the padded active mask
    actp = _pad_to(ray_active.astype(I32), blk, axis=0)
    blk_live = jnp.any(actp.reshape(nblk, blk) != 0, axis=1).astype(I32)
    flag_spec = pl.BlockSpec((nblk,), lambda i: (0,),
                             memory_space=pltpu.SMEM)

    out_dts = [I32, F32, I32, I32, F32, F32, F32]
    in_specs = ([ray_spec] * 8
                + [full(vtab), full(slot), full(comp), full(bm)])
    if has_pal:
        in_specs += [full(palw), full(pal16)]
        out_dts.append(I32)
    ins += [blk_live]
    in_specs += [flag_spec]
    out_shapes = [jax.ShapeDtypeStruct((nblk, block_rows, 128), dt)
                  for dt in out_dts]
    outs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=[ray_spec] * len(out_dts),
        out_shape=out_shapes,
        interpret=interpret,
    )(*ins)

    outs = [x.reshape(npad)[:n] for x in outs]
    hit_i, t, vol, gidx, nx, ny, nz = outs[:7]
    sg = jax.lax.stop_gradient
    if mode == "occluded":
        return dict(hit=sg(hit_i != 0))
    hitm = hit_i != 0
    if has_pal:
        cell = outs[7]
    else:
        mat = jnp.take(grids_flat, gidx, mode="clip")
        cell = jnp.where(hitm, mat, MAT_NONE)
    out = dict(
        hit=sg(hitm),
        t=sg(t),
        cell=sg(cell),
        vol=sg(vol),
        nx=sg(nx), ny=sg(ny), nz=sg(nz),
    )
    if count_iters:
        out["iters"] = sg(gidx)  # per-ray copy of its block's trip count
    return out
