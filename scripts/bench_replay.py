#!/usr/bin/env python
"""Path-replay gradient benchmark (VERDICT r3 item 3): the gradient of the
PATH-TRACED estimator the bench forward renders — replayed hard geometry,
differentiable throughput (diff/path_replay.py) — at 1080p monu bench
settings, plus an FD assertion at reduced resolution so the recorded
number is a verified gradient, not just a timing.

Writes one JSON object to artifacts/BENCH_REPLAY_r04.json and echoes it to
stdout.  Timing follows bench.py's tunnel rules (host scalar pull).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W = int(os.environ.get("BR_WIDTH", 1920))
H = int(os.environ.get("BR_HEIGHT", 1080))
BANDS = int(os.environ.get("BR_BANDS", 4))
N_STEPS = int(os.environ.get("BR_STEPS", 24))
SEG_STEPS = int(os.environ.get("BR_SEG_STEPS", 12))
REPS = int(os.environ.get("BENCH_REPS", 3))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    import numpy as np

    from voxtracer.diff.path_replay import mse_loss_replay
    from voxtracer.diff.volumetric import params_from_scene
    from voxtracer.scene.presets import monu_path

    log("devices:", jax.devices())

    # ---- FD verification at reduced resolution (the gradient is real)
    fd_w, fd_h = 192, 108
    scene_s, cfg_s = monu_path(width=fd_w, height=fd_h, gridsize=32,
                               which=(1,), bounces=4)
    scene_s = jax.tree.map(jnp.asarray, scene_s)
    params_s = params_from_scene(scene_s, occupied_logit=0.5)
    key = jax.random.PRNGKey(0)
    target_s = jnp.zeros((fd_h, fd_w, 3), jnp.float32)

    def loss_s(p):
        # SUM loss: mean-loss FD deltas sit below f32 resolution
        from voxtracer.diff.path_replay import render_diff_replay

        img = render_diff_replay(p, scene_s, cfg_s, key, N_STEPS, SEG_STEPS)
        return jnp.sum((img - target_s) ** 2)

    g = jax.grad(loss_s)(params_s)
    gd = np.asarray(g.density_logits)
    assert np.isfinite(gd).all()
    flat = np.abs(gd).reshape(-1)
    top = int(np.argmax(flat))
    eps = 2e-2
    dl = np.asarray(params_s.density_logits).reshape(-1)

    def at(v):
        d2 = dl.copy()
        d2[top] = v
        p2 = params_s.replace(density_logits=jnp.asarray(
            d2.reshape(params_s.density_logits.shape)))
        return float(loss_s(p2))

    fd = (at(dl[top] + eps) - at(dl[top] - eps)) / (2 * eps)
    ad = float(gd.reshape(-1)[top])
    rel = abs(fd - ad) / max(abs(fd), 1e-9)
    log(f"FD check (top density cell): autodiff {ad:.5g} fd {fd:.5g} "
        f"rel {rel:.3f}")
    assert rel < 0.15, (ad, fd)

    # ---- 1080p replay gradient, banded (tunnel watchdog bounds a single
    # dispatch; each band is its own jitted grad)
    scene, cfg = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3),
                           bounces=4)
    scene = jax.tree.map(jnp.asarray, scene)
    params = params_from_scene(scene)
    rows = -(-H // BANDS)
    target = jnp.zeros((rows, W, 3), jnp.float32)
    gl = jax.jit(jax.grad(mse_loss_replay),
                 static_argnames=("cfg", "n_steps", "seg_steps", "rows"))

    def full_grad(k):
        total = None
        for b in range(BANDS):
            r0 = jnp.float32(min(b * rows, H - rows))
            gb = gl(params, scene, cfg, target, k, N_STEPS, SEG_STEPS,
                    row0=r0, rows=rows)
            np.asarray(gb.albedo_table[:1, :1])  # per-band pull (watchdog)
            total = gb if total is None else jax.tree.map(jnp.add, total, gb)
        return total

    g = full_grad(key)  # compile + warm
    ts = []
    for i in range(REPS):
        t0 = time.time()
        g = full_grad(jax.random.fold_in(key, i))
        np.asarray(g.albedo_table[:1, :1])
        ts.append(time.time() - t0)
    sec = float(np.median(ts))
    n_rays = W * H
    log(f"replay grad 1080p: {sec * 1e3:.0f} ms -> "
        f"{n_rays / sec / 1e6:.3f} Mrays/s "
        f"(steps={N_STEPS}/{SEG_STEPS}, {BANDS} bands)")
    out = {
        "metric": "path-replay gradient rays/s at 1080p "
                  "(replayed hard path, diff throughput, fd-checked)",
        "value": round(n_rays / sec, 1),
        "unit": "rays/s",
        "grad_ms": round(sec * 1e3, 1),
        "n_steps": N_STEPS,
        "seg_steps": SEG_STEPS,
        "fd_rel_err": round(rel, 4),
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/BENCH_REPLAY_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
