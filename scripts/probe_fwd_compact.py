#!/usr/bin/env python
"""Forward compaction re-sweep after take_rows (round-5b): the compacted
wavefront path was net-negative when its per-bounce [n,22] permute cost
62 ms; chunked takes cut that to ~11 ms — re-price it."""
import dataclasses
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

from voxtracer.render.integrator import _render_banded
from voxtracer.scene.presets import monu_path


def main():
    scene, cfg0 = monu_path(width=1920, height=1080, gridsize=64,
                            which=(1, 2, 3), bounces=4)
    scene = jax.tree.map(jnp.asarray, scene)
    key = jax.random.PRNGKey(0)
    chunks = [int(c) for c in os.environ.get("CHUNKS", "1,4,8").split(",")]
    for ch in chunks:
        cfg = dataclasses.replace(cfg0, compact_chunks=ch, compact_min=1024)

        def once(k):
            return np.asarray(jnp.mean(_render_banded(scene, cfg, k, 1, 1)))

        t0 = time.time()
        m = once(key)
        warm = time.time() - t0
        ts = []
        for i in range(3):
            t0 = time.time()
            once(jax.random.fold_in(key, i))
            ts.append(time.time() - t0)
        ms = float(np.median(ts)) * 1e3
        print(f"chunks={ch:2d}: {ms:6.1f} ms  ({1920*1080/(ms/1e3)/1e6:.2f} "
              f"Mrays/s)  mean={float(m):.5f}  warm={warm:.0f}s", flush=True)


if __name__ == "__main__":
    main()
