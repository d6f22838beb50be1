"""Measure host-pull cost vs payload size through the tunnel (viewer
frame-loop budget): scalar, 37 KB, 163 KB, 6 MB uint8 pulls."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

shapes = [(1,), (96, 128, 3), (212, 256, 3), (1080, 1920, 3)]


from functools import partial


@partial(jax.jit, static_argnames=("h", "w"))
def make(x, h, w):
    img = jnp.broadcast_to(x, (h, w, 3)) * jnp.ones((h, w, 3))
    return (img * 255).astype(jnp.uint8)


x = jnp.float32(0.5)
for shp in shapes:
    h, w = (shp[0], shp[1]) if len(shp) == 3 else (1, 1)
    out = make(x, h, w)
    np.asarray(out)  # warm
    times = []
    for i in range(5):
        t0 = time.time()
        np.asarray(make(x + i * 1e-6, h, w))
        times.append(time.time() - t0)
    print(f"{h}x{w}x3 uint8 ({h*w*3/1024:.0f} KB): "
          f"median {sorted(times)[2]*1000:.1f} ms", flush=True)
