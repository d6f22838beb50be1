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
OUT = os.environ.get("BENCH_BREADTH_OUT", "BENCH_BREADTH_r04.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CONFIGS = {
    "room": lambda p: p.room_whitted(),              # 512^2 whitted
    "roomglass": lambda p: p.room_whitted(glass=True),
    "city": lambda p: p.city_path(),                 # 17 vols, 1080p path
    "cityxl": lambda p: p.city_xl_path(),            # 111 vols, paged Pallas
}


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
