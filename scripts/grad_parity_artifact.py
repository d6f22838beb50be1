#!/usr/bin/env python
"""Bench-scale gradient-parity artifact (VERDICT r4 item 7): one recorded
run at 256x144 monu comparing

  1. fast-bin gradients (the bench's (2,10)-step span bins, span=1)
     vs reference-step gradients (48 steps, span=4)  — cosine;
  2. reference settings vs a 2x-refined reference (96 steps) — cosine
     (convergence evidence for the reference config itself);
  3. per-cell central finite differences vs autodiff AT REFERENCE
     SETTINGS on the strongest density cells — relative errors;

so BASELINE's "image + pixel-grad allclose" claim has evidence above toy
scale.  Writes artifacts/GRAD_PARITY_r05.json.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from voxtracer.diff.volumetric import (max_aabb_crossings, mse_loss,
                                       params_from_scene, span_cells_bins)
from voxtracer.scene.presets import monu_path

W, H = 256, 144


def main():
    scene, cfg = monu_path(width=W, height=H, gridsize=64, which=(1, 2, 3),
                           bounces=4)
    scene = jax.tree.map(jnp.asarray, scene)
    params = params_from_scene(scene)
    kk = min(max_aabb_crossings(scene, cfg), scene.volumes.n)
    tgt = jnp.asarray(np.random.RandomState(1).rand(H, W, 3)
                      .astype(np.float32))
    bins = span_cells_bins(scene, cfg, rows=H, edges=(4.0,))
    key = jax.random.PRNGKey(2)

    def binned_grad(steps_map, span, bb=None):
        tot = None
        for bi, p, ip, na in (bb if bb is not None else bins):
            g = jax.grad(mse_loss)(params, scene, cfg, tgt, key,
                                   steps_map[bi], row0=jnp.float32(0),
                                   rows=H, k=kk, span_steps=span,
                                   perm=jnp.asarray(p),
                                   inv_perm=jnp.asarray(ip), n_active=na)
            tot = g if tot is None else jax.tree.map(jnp.add, tot, g)
        return tot

    def cos(a, b):
        a = np.asarray(a.density_logits).ravel()
        b = np.asarray(b.density_logits).ravel()
        return float(np.dot(a, b)
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))

    g_fast = binned_grad((2, 10), 1)
    g_ref = binned_grad((48, 48), 4)
    g_ref2 = binned_grad((96, 96), 4)
    c_fast = cos(g_fast, g_ref)
    c_ref = cos(g_ref, g_ref2)
    # PER-VOLUME cosines — the metric that exposed round 5's near-miss:
    # cheaper bin settings held the global cosine at 0.99 (floor-volume
    # dominance) while the fine monu volumes collapsed to 0.14-0.41
    gf = np.asarray(g_fast.density_logits)
    gr = np.asarray(g_ref.density_logits)
    pervol = []
    for vi in range(gf.shape[0]):
        a, r = gf[vi].ravel(), gr[vi].ravel()
        pervol.append(round(float(
            np.dot(a, r) / (np.linalg.norm(a) * np.linalg.norm(r)
                            + 1e-30)), 4))
    print(f"fast-bin vs reference cosine: {c_fast:.4f}", file=sys.stderr)
    print(f"reference vs 2x-refined cosine: {c_ref:.4f}", file=sys.stderr)

    # per-cell FD spot checks at REFERENCE settings.  Two traps this
    # avoids (the first artifact run hit both): (a) the MEAN loss's FD
    # deltas sit at f32 resolution — use the SUM loss (x denom);
    # (b) every occupied cell carries the SAME logit, so a downward
    # perturbation creates a new global density MINIMUM and moves the
    # stop-gradient'd transmittance-clamp margin (13.8/sig_min) — a real
    # discontinuity AD intentionally ignores.  FD therefore runs around a
    # base point with the probed cells pre-bumped +0.1 (clear of the tie).
    denom = float(H * W * 3)

    def ref_loss_sum(p):
        tot = 0.0
        for bi, pp, ip, na in bins:
            tot = tot + mse_loss(p, scene, cfg, tgt, key, 48,
                                 row0=jnp.float32(0), rows=H, k=kk,
                                 span_steps=4, perm=jnp.asarray(pp),
                                 inv_perm=jnp.asarray(ip), n_active=na)
        return tot * denom

    ref_loss_j = jax.jit(ref_loss_sum)
    ref_grad_j = jax.jit(jax.grad(ref_loss_sum))
    gd0 = np.asarray(g_ref.density_logits)
    # FD-resolvable cells only: the f32 SUM loss carries ~1e-2 of
    # accumulated rounding at this magnitude, so a measurable central
    # difference needs |grad| * 2 eps >> that (the first runs probed
    # cells whose true delta was ~1 ulp and read pure quantization)
    flat0 = np.abs(gd0).ravel() * denom
    top = [fi for fi in np.argsort(flat0)[-64:] if flat0[fi] > 3.0][-4:]
    if not top:
        top = list(np.argsort(flat0)[-2:])
    base = np.asarray(params.density_logits).copy()
    for fi in top:
        vi, xi, yi, zi = np.unravel_index(int(fi), gd0.shape)
        base[vi, xi, yi, zi] += 0.1
    params_b = dataclasses.replace(params,
                                   density_logits=jnp.asarray(base))
    gd = np.asarray(ref_grad_j(params_b).density_logits)
    eps = 2e-2
    checks = []
    for fi in top:
        vi, xi, yi, zi = np.unravel_index(int(fi), gd0.shape)
        vals = []
        for s in (+1.0, -1.0):
            dl = base.copy()
            dl[vi, xi, yi, zi] += s * eps
            vals.append(float(ref_loss_j(dataclasses.replace(
                params, density_logits=jnp.asarray(dl)))))
        fd = (vals[0] - vals[1]) / (2 * eps)
        ad = float(gd[vi, xi, yi, zi])
        rel = abs(fd - ad) / max(abs(fd), 1e-12)
        checks.append({"cell": [int(vi), int(xi), int(yi), int(zi)],
                       "fd": fd, "ad": ad, "rel_err": round(rel, 4)})
        print(f"  FD cell {vi},{xi},{yi},{zi}: fd {fd:.5g} ad {ad:.5g} "
              f"rel {rel:.4f}", file=sys.stderr)

    # directional-derivative checks: FD of L(p + a*v) along v = the
    # normalized reference gradient restricted to ONE volume — aggregates
    # thousands of individually-unresolvable cells into one delta far
    # above the f32 summation noise, and still a true derivative test
    # (must equal <g, v>).
    dir_checks = []
    for vi in range(gd0.shape[0]):
        v = np.zeros_like(gd0)
        v[vi] = gd0[vi]
        nv = np.linalg.norm(v)
        if nv < 1e-12:
            continue
        v = v / nv
        expect = float((gd0 * v).sum() * denom)
        a = 5e-2
        vals = []
        for s in (+1.0, -1.0):
            dl = np.asarray(params.density_logits) + s * a * v
            vals.append(float(ref_loss_j(dataclasses.replace(
                params, density_logits=jnp.asarray(dl)))))
        fd = (vals[0] - vals[1]) / (2 * a)
        rel = abs(fd - expect) / max(abs(expect), 1e-12)
        dir_checks.append({"volume": int(vi), "fd": fd, "ad": expect,
                           "rel_err": round(rel, 4)})
        print(f"  dir-FD vol {vi}: fd {fd:.5g} ad {expect:.5g} "
              f"rel {rel:.4f}", file=sys.stderr)

    out = {
        "scene": f"monu {W}x{H} gridsize 64, bounces 4",
        "cosine_fastbin_vs_reference": round(c_fast, 4),
        "per_volume_cosine_fastbin": pervol,
        "cosine_reference_vs_2x": round(c_ref, 4),
        "fd_checks_at_reference_settings": checks,
        "directional_fd_checks": dir_checks,
        "fast_settings": "bins (2,10) steps at edge 4 cells, span=1 (the bench setting)",
        "reference_settings": "48 steps, span=4 (2x-refined: 96 steps)",
        "notes": (
            "FD runs in f32 on-device: the SUM loss carries ~1e-2 of "
            "accumulated rounding, so only deltas well above that are "
            "probed; residual FD-vs-AD spread (3-20%) combines that "
            "noise floor with the intentionally stop-gradient'd "
            "transmittance-clamp margin, which FD sees move when a "
            "perturbation lowers the global minimum occupied density "
            "(all occupied cells share one logit, so downward moves "
            "always do). The cosines are the bench-scale parity "
            "evidence; toy-scale double-checked FD lives in "
            "tests/test_diff.py."),
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/GRAD_PARITY_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
