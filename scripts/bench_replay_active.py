#!/usr/bin/env python
"""Replay-gradient benchmark, round-5 active path (VERDICT r4 item 3b):
precomputed frozen geometry + batched span-binned segment marches
(diff/replay_active.py) vs round-4's 0.53 Mrays/s full-width replay.

Writes artifacts/BENCH_REPLAY_r05.json: grad throughput at 1080p monu +
an FD check at bench settings (rel err bar <= 2%).
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from voxtracer.diff.replay_active import make_replay_grad_fn, replay_precompute
from voxtracer.diff.volumetric import params_from_scene
from voxtracer.scene.presets import monu_path

W, H = 1920, 1080


def main():
    scene_np, cfg = monu_path(width=W, height=H, gridsize=64,
                              which=(1, 2, 3), bounces=4)
    scene = jax.tree.map(jnp.asarray, scene_np)
    params = params_from_scene(scene)
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    pre = replay_precompute(scene, cfg, key)
    pre_s = time.time() - t0
    print(f"precompute {pre_s:.1f}s  n_hit={pre['n_hit']} n_c={pre['n_c']} "
          f"media={pre['media_lanes']}", file=sys.stderr, flush=True)
    for nm, m in pre["marches"].items():
        print("  march", nm, "m:", m["m"], "bins:",
              [(s, hi - lo) for s, lo, hi in m.get("bins", [])],
              file=sys.stderr, flush=True)

    tgt = jnp.zeros((pre["n_c"], 3), jnp.float32)
    denom = float(W * H * 3)
    gfn, lfn = make_replay_grad_fn(scene, cfg, pre, tgt, denom)
    t0 = time.time()
    g = gfn(params)
    np.asarray(g.albedo_table[:1, :1])
    print(f"grad compile+first {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        g = gfn(params)
        np.asarray(g.albedo_table[:1, :1])
        ts.append(time.time() - t0)
    sec = float(np.median(ts))
    mrays = W * H / sec / 1e6
    print(f"replay-active grad: {sec*1e3:.0f} ms = {mrays:.2f} Mrays/s",
          file=sys.stderr, flush=True)

    # FD at bench settings (the strongest density-gradient cell)
    gd = np.asarray(g.density_logits)
    fi = int(np.abs(gd).ravel().argmax())
    vi, xi, yi, zi = np.unravel_index(fi, gd.shape)
    eps = 2e-2
    vals = []
    for s in (+1.0, -1.0):
        dl = np.asarray(params.density_logits).copy()
        dl[vi, xi, yi, zi] += s * eps
        vals.append(float(lfn(dataclasses.replace(
            params, density_logits=jnp.asarray(dl)))))
    fd = (vals[0] - vals[1]) / (2 * eps)
    ad = float(gd[vi, xi, yi, zi])
    rel = abs(fd - ad) / max(abs(fd), 1e-12)
    print(f"FD {fd:.6g} AD {ad:.6g} rel {rel:.4f}", file=sys.stderr,
          flush=True)

    out = {
        "metric": "replay-gradient rays/s at 1080p monu (active path)",
        "grad_ms": round(sec * 1e3, 1),
        "mrays_s": round(mrays, 3),
        "precompute_s": round(pre_s, 1),
        "fd_rel_err": round(rel, 4),
        "fd": fd, "ad": ad,
        "n_hit": pre["n_hit"],
        "r04_baseline_mrays_s": 0.53,
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/BENCH_REPLAY_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
