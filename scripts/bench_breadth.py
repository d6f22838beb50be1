#!/usr/bin/env python
"""Per-config forward-throughput tracking (VERDICT r2 item 10): BENCH-style
JSON for BASELINE configs beyond the headline monu — whitted room /
roomGlass at 512^2, city and city-XL at 1080p.

Usage: python scripts/bench_breadth.py [config ...] (default: all)
Appends one JSON object per config to BENCH_BREADTH_r03.json and echoes
them to stdout; diagnostics on stderr.  Timing follows bench.py's rules:
device-side scalar pull (block_until_ready is a no-op through the tunnel).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("BENCH_REPS", 3))
OUT = os.environ.get("BENCH_BREADTH_OUT", "BENCH_BREADTH_r05.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CONFIGS = {
    "room": lambda p: p.room_whitted(),              # 512^2 whitted
    "roomglass": lambda p: p.room_whitted(glass=True),
    "city": lambda p: p.city_path(),                 # 17 vols, 1080p path
    "cityxl": lambda p: p.city_xl_path(),            # 111 vols, paged Pallas
    "reproject": None,  # special-cased below: static-camera temporal mode
}


def _bench_reproject(jax, jnp, np, presets, log):
    """Static-camera temporal-reuse frame loop (renderer.cpp:1997-2101 is
    the reference's cheap-frame mode): per-frame time INCLUDING the
    history-buffer round trip (history stays device-side; each frame is
    one dispatch + a scalar pull)."""
    import dataclasses
    import time as _t

    from voxtracer.render.reproject import render_reproject_frame_jit

    scene, cfg = presets.monu_path(width=1920, height=1080, gridsize=64,
                                   which=(1, 2, 3), bounces=4)
    cfg = dataclasses.replace(cfg, mode="reproject")
    scene = jax.tree.map(jnp.asarray, scene)
    key = jax.random.PRNGKey(0)
    h = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    img, h, _ = render_reproject_frame_jit(scene, cfg, scene.camera, h, key)
    np.asarray(jnp.mean(img))  # compile + warm (frame 0 fills history)
    ts = []
    for i in range(1, 1 + REPS * 2):
        t0 = _t.time()
        img, h, _ = render_reproject_frame_jit(
            scene, cfg, scene.camera, h, jax.random.fold_in(key, i))
        np.asarray(jnp.mean(img))
        ts.append(_t.time() - t0)
    sec = float(np.median(ts))
    rec = {
        "config": "reproject",
        "mode": "reproject",
        "resolution": "1920x1080",
        "volumes": int(scene.volumes.n),
        "paged": False,
        "frame_ms": round(sec * 1e3, 1),
        "mrays_s": round(cfg.width * cfg.height / sec / 1e6, 3),
    }
    log(json.dumps(rec))
    return rec


def main():
    import jax

    cache_dir = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    import numpy as np

    from voxtracer.render.integrator import _render_banded
    from voxtracer.scene import presets

    names = sys.argv[1:] or list(CONFIGS)
    results = []
    for name in names:
      try:
          if name == "reproject":
              rec = _bench_reproject(jax, jnp, np, presets, log)
              results.append(rec)
              with open(OUT, "a") as f:
                  f.write(json.dumps(rec) + "\n")
              continue
          scene, cfg = CONFIGS[name](presets)
          scene = jax.tree.map(jnp.asarray, scene)
          key = jax.random.PRNGKey(0)
          n_rays = cfg.width * cfg.height

          def once(k):
              return np.asarray(jnp.mean(_render_banded(scene, cfg, k, 1, 1)))

          t0 = time.time()
          log(f"{name}: image mean {float(once(key)):.4f} "
              f"(compile+warm {time.time() - t0:.0f}s)")
          ts = []
          for i in range(REPS):
              t0 = time.time()
              once(jax.random.fold_in(key, i))
              ts.append(time.time() - t0)
          sec = float(np.median(ts))
          rec = {
              "config": name,
              "mode": cfg.mode,
              "resolution": f"{cfg.width}x{cfg.height}",
              "volumes": int(scene.volumes.n),
              "paged": scene.volumes.pages is not None,
              "frame_ms": round(sec * 1e3, 1),
              "mrays_s": round(n_rays / sec / 1e6, 3),
          }
          log(json.dumps(rec))
          results.append(rec)
          with open(OUT, "a") as f:  # append as we go — tunnel faults on a
              f.write(json.dumps(rec) + "\n")  # later config keep earlier rows
      except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {e}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
