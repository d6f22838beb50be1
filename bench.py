#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): rays/sec/chip fwd+bwd at 1080p — measured
as primary rays per second for one full forward render (path integrator,
monu config, Pallas VMEM traversal) PLUS one backward pass of the
differentiable integrator (union-span relaxed march) on the same ray
population.  vs_baseline is against the 1 Grays/s forward target.

Timing is honest for the axon tunnel: jax.block_until_ready is a NO-OP
through it (PERF_NOTES.md), so every measurement pulls data to the host.

Extra diagnostics go to stderr; stdout carries exactly one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WIDTH = int(os.environ.get("BENCH_WIDTH", 1920))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 1080))
REPS = int(os.environ.get("BENCH_REPS", 3))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    # Persistent XLA compilation cache: the 1080p programs take minutes to
    # compile through the tunnel; warmed once, every later bench run (and
    # the driver's) loads the executables from disk in seconds.
    cache_dir = os.environ.get("JAX_CACHE_DIR",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # older jax: cache is an optimization, not a need
        log("compilation cache unavailable:", e)

    import jax.numpy as jnp
    import numpy as np

    from voxtracer.diff.volumetric import (grad_fn, max_aabb_crossings,
                                           params_from_scene)
    from voxtracer.scene.presets import monu_path

    log("devices:", jax.devices())
    scene, cfg = monu_path(width=WIDTH, height=HEIGHT, gridsize=64,
                           which=(1, 2, 3), bounces=4)
    scene = jax.tree.map(jnp.asarray, scene)
    key = jax.random.PRNGKey(0)
    n_rays = WIDTH * HEIGHT
    # single fused dispatch for the whole frame (scripts/profile_frame.py:
    # banding and wavefront compaction are both net-negative since the
    # Pallas traversal early-exits per ray block)
    tiles = int(os.environ.get("BENCH_TILES", 1))
    # backward: union-span relaxed march over the occupied-brick span
    # (scripts/bench_bwd.py sweep)
    span_steps = int(os.environ.get("BENCH_SPAN_STEPS", 1))
    tiles_bwd = int(os.environ.get("BENCH_TILES_BWD", 2))

    # ---- forward (hard path tracer, Pallas VMEM traversal).  Timing
    # (_render_banded is render_tiled minus the host image transfer.)
    # pulls a device-side scalar, not the 24 MB image: the tunnel's
    # device->host transfer (~0.5 s for a full frame) is a test-rig
    # artifact, not render compute (PERF_NOTES.md timing rules).
    from voxtracer.render.integrator import _render_banded

    def fwd_once(k):
        return np.asarray(jnp.mean(_render_banded(scene, cfg, k, 1, tiles)))

    log("forward image mean:", float(fwd_once(key)))  # compile + warm
    ts = []
    for i in range(REPS):
        t0 = time.time()
        fwd_once(jax.random.fold_in(key, i))
        ts.append(time.time() - t0)
    fwd_s = float(np.median(ts))
    fwd_rays = n_rays / fwd_s
    log(f"forward: {fwd_s * 1e3:.0f} ms -> {fwd_rays / 1e6:.3f} Mrays/s")

    # ---- fwd+bwd (differentiable integrator, gradients wrt density+albedo)
    params = params_from_scene(scene)
    rows = -(-HEIGHT // tiles_bwd)
    target_band = jnp.zeros((rows, WIDTH, 3), jnp.float32)
    # exact pair-compaction bound for this camera (host slab tests)
    diff_k = min(max_aabb_crossings(scene, cfg), scene.volumes.n)
    log(f"diff pair compaction k={diff_k} of V={scene.volumes.n}; "
        f"union-span march span={span_steps} (binned steps below)")

    from voxtracer.diff.volumetric import (mse_loss_active, span_cells_bins,
                                           spans_for_rays)
    from voxtracer.render.camera import primary_rays
    from voxtracer.render.sky import sample_sky

    # active-ray compaction + span-length binning + loop-invariant
    # precompute: everything camera-derived (rays, their compaction, the
    # background sky, the compacted target) is computed ONCE here, outside
    # the optimizer step — the round-4 trace measured the per-step
    # un-compaction gathers + sky takes + compaction takes at ~60 ms of a
    # 237 ms backward, all of it param-independent.  The march costs per
    # sampled ROW (n_steps x active rays); the clamped core span is
    # bimodal (p50 0.4 cells vs p90 ~100 at 1080p monu), so each bin
    # marches with a step count matched to its spans.  Per-bin gradients
    # sum exactly to the full-band image-MSE gradient (excluded pixels
    # contribute parameter-free constants).
    # (2,10) steps at edge 4: every cheaper bin variant that looked fine
    # on the GLOBAL gradient cosine (0.99 at 256x144) turned out to be
    # coasting on the floor volume's dominant components — the PER-VOLUME
    # cosines of the fine monu grids drop from ~0.51 to 0.14-0.41 under
    # (2,6)@6 and friends (GRAD_PARITY_r05.json records per-volume
    # alignment; PERF_NOTES round-5 "the cosine that lied").
    bin_steps = tuple(int(s) for s in os.environ.get(
        "BENCH_BIN_STEPS", "2,10").split(","))
    bin_edges = tuple(float(e) for e in os.environ.get(
        "BENCH_BIN_EDGES", "4").split(","))
    denom = float(rows * WIDTH * 3)
    bin_data = []
    bin_static = []
    for b in range(tiles_bwd):
        r0 = min(b * rows, HEIGHT - rows)
        x = jnp.arange(WIDTH, dtype=jnp.float32)
        y = jnp.arange(rows, dtype=jnp.float32) + r0
        px, py = jnp.meshgrid(x, y)
        o, d = primary_rays(scene.camera, WIDTH, HEIGHT, px.reshape(-1),
                            py.reshape(-1), None, jnp)
        bins = span_cells_bins(scene, cfg, row0=r0, rows=rows,
                               edges=bin_edges)
        log(f"band {b}: active bins "
            + " ".join(f"{na}@{bin_steps[bi]}st"
                       for (bi, _, _, na) in bins))
        tgt_flat = target_band.reshape(-1, 3)
        for bi, p, ip, na in bins:  # steps/clamp keyed off the BIN INDEX
            steps = bin_steps[bi]
            nap = min(-(-na // 1024) * 1024, o.shape[0])
            sel = jnp.asarray(p[:nap])
            oc = jnp.take(o, sel, axis=0)
            dc = jnp.take(d, sel, axis=0)
            bg = sample_sky(scene.sky, dc, cfg.activate_sky,
                            cfg.sky_fallback)
            t_act = jnp.take(tgt_flat, sel, axis=0)
            # bin 0 = sub-4-cell spans: skip the transmittance-clamp
            # nearest pass (render_diff_active clamp=False).  na masks
            # the padded tail (foreign rays march in their own bin).
            # occupied spans are occupancy+camera-derived — precompute
            # the slab pass here, outside the per-step grad (round 5)
            sp = spans_for_rays(scene, oc, dc)
            # arrays ride the jit signature (large closure constants can
            # exceed the tunnel compiler's request-size limit);
            # steps/clamp/na stay static via bin_static
            bin_data.append(dict(oc=oc, dc=dc, bg=bg, t_act=t_act, sp=sp))
            bin_static.append((steps, bi > 0, na))

    def _grads(bd):
        total = None
        for arrs, (steps, clamp, na) in zip(bd, bin_static):
            g = jax.grad(mse_loss_active)(params, scene, cfg, arrs["oc"],
                                          arrs["dc"], arrs["bg"],
                                          arrs["t_act"], denom, steps,
                                          k=diff_k, span_steps=span_steps,
                                          clamp=clamp, n_active=na,
                                          spans=arrs["sp"])
            total = g if total is None else jax.tree.map(jnp.add, total, g)
        return total

    @jax.jit
    def train_step(k, bd):
        # the production step shape: ONE dispatch renders the frame AND
        # computes the full parameter gradient — fusing drops one ~25 ms
        # tunnel round trip vs dispatching fwd and bwd separately (each
        # band/bin grad already fused since round 2)
        img_mean = jnp.mean(_render_banded(scene, cfg, k, 1, tiles))
        return img_mean, _grads(bd)

    m, g = train_step(key, bin_data)  # compile + warm
    np.asarray(m)
    ts = []
    for i in range(REPS):
        t0 = time.time()
        m, g = train_step(jax.random.fold_in(key, i), bin_data)
        np.asarray(m)
        np.asarray(g.albedo_table[:1, :1])
        ts.append(time.time() - t0)
    both_s = float(np.median(ts))
    fb_rays = n_rays / both_s
    log(f"bwd (est = fused - fwd): {(both_s - fwd_s) * 1e3:.0f} ms; "
        f"fused fwd+bwd: {both_s * 1e3:.0f} ms"
        f" -> {fb_rays / 1e6:.3f} Mrays/s")

    print(json.dumps({
        "metric": "rays/sec/chip fwd+bwd at 1080p (path fwd + diff bwd)",
        "value": round(fb_rays, 1),
        "unit": "rays/s",
        "vs_baseline": round(fb_rays / 1e9, 6),
    }))


if __name__ == "__main__":
    from voxtracer.utils.retry import with_retries

    with_retries(main, attempts=2, backoff_s=180.0)
