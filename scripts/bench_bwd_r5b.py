#!/usr/bin/env python
"""Backward decomposition at EXACT round-5 bench settings (bins (2,10)@4,
2 bands, spans precomputed, fused grad-only step — no hard forward, so
the deltas are pure backward).  Ablations toggle volumetric._ABLATE_* at
trace time; forward values change under some ablations but the TIMING
delta prices the op.  Appends each line to stderr as it lands (tunnel
rule 7)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from voxtracer.diff import volumetric as V
from voxtracer.render.camera import primary_rays
from voxtracer.render.sky import sample_sky
from voxtracer.scene.presets import monu_path

W, H = 1920, 1080
TILES_BWD = 2
BIN_STEPS = tuple(int(x) for x in os.environ.get("BS", "2,10").split(","))
BIN_EDGES = (4.0,)


def main():
    scene, cfg = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3),
                           bounces=4)
    scene = jax.tree.map(jnp.asarray, scene)
    params = V.params_from_scene(scene)
    rows = -(-H // TILES_BWD)
    denom = float(rows * W * 3)
    diff_k = min(V.max_aabb_crossings(scene, cfg), scene.volumes.n)

    bin_data, bin_static = [], []
    for b in range(TILES_BWD):
        r0 = min(b * rows, H - rows)
        x = jnp.arange(W, dtype=jnp.float32)
        y = jnp.arange(rows, dtype=jnp.float32) + r0
        px, py = jnp.meshgrid(x, y)
        o, d = primary_rays(scene.camera, W, H, px.reshape(-1),
                            py.reshape(-1), None, jnp)
        bins = V.span_cells_bins(scene, cfg, row0=r0, rows=rows,
                                 edges=BIN_EDGES)
        tgt = jnp.zeros((rows * W, 3), jnp.float32)
        for bi, p, ip, na in bins:
            nap = min(-(-na // 1024) * 1024, o.shape[0])
            sel = jnp.asarray(p[:nap])
            oc = jnp.take(o, sel, axis=0)
            dc = jnp.take(d, sel, axis=0)
            bg = sample_sky(scene.sky, dc, cfg.activate_sky, cfg.sky_fallback)
            t_act = jnp.take(tgt, sel, axis=0)
            sp = V.spans_for_rays(scene, oc, dc)
            bin_data.append(dict(oc=oc, dc=dc, bg=bg, t_act=t_act, sp=sp))
            bin_static.append((BIN_STEPS[bi], bi > 0, na))

    def make_step():
        @jax.jit
        def step(bd):
            total = None
            for arrs, (steps, clamp, na) in zip(bd, bin_static):
                g = jax.grad(V.mse_loss_active)(
                    params, scene, cfg, arrs["oc"], arrs["dc"], arrs["bg"],
                    arrs["t_act"], denom, steps, k=diff_k, span_steps=1,
                    clamp=clamp, n_active=na, spans=arrs["sp"])
                total = g if total is None else jax.tree.map(jnp.add, total, g)
            return total
        return step

    def timed(step):
        g = step(bin_data)
        np.asarray(g.albedo_table[:1, :1])
        ts = []
        for _ in range(3):
            t0 = time.time()
            g = step(bin_data)
            np.asarray(g.albedo_table[:1, :1])
            ts.append(time.time() - t0)
        return float(np.median(ts)) * 1e3

    variants = [
        ("baseline", {}),
        ("no cell scatter", {"_ABLATE_CELL_SCATTER": True}),
        ("no cell fetch", {"_ABLATE_CELL_FETCH": True}),
        ("no alb fetch", {"_ABLATE_ALB_FETCH": True}),
        ("no bsig adj", {"_ABLATE_BSIG_ADJ": True}),
        ("no clamp pass", {"_ABLATE_CLAMP": True}),
    ]
    base = None
    for name, flags in variants:
        saved = {kk: getattr(V, kk) for kk in flags}
        for kk, vv in flags.items():
            setattr(V, kk, vv)
        try:
            ms = timed(make_step())
        finally:
            for kk, vv in saved.items():
                setattr(V, kk, vv)
        if base is None:
            base = ms
        print(f"{name:18s}: {ms:7.1f} ms   delta {base - ms:+7.1f}",
              flush=True)


if __name__ == "__main__":
    main()
