#!/usr/bin/env python
"""On-chip live-viewer frame-rate artifact (VERDICT r3 missing #4).

Round 2's bar: >5 fps at the reference's 256x212 (camera.h:4-5).  Two
components measured separately, because they bound different things:
  * the jitted frame step through the tunnel (render + progressive lerp +
    tonemap + uint8 pull) — dominated by the ~25 ms dispatch constant;
  * the terminal ANSI half-block assembly (Python string work, no device).

Writes artifacts/VIEWER_FPS_r05.json.
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import numpy as np

    from voxtracer.scene.presets import monu_path
    from voxtracer.viewer import TermDisplay, run_live

    w, h = 256, 212  # the reference's fixed logical resolution
    scene, cfg = monu_path(width=w, height=h, gridsize=64, which=(1, 2, 3),
                           bounces=4)
    frames = 24
    # scripted: a few idle frames, one move (reset), more idle — the
    # steady-state accumulate loop the reference's frame loop runs
    script = [set()] * 8 + [{"w"}] + [set()] * (frames - 9)
    t0 = time.time()
    n, report = run_live(scene, cfg, script=script, display=False)
    total = time.time() - t0
    # steady-state: skip the first (compile) frame
    times = report.times[1:] if hasattr(report, "times") else None
    if times:
        ms = float(np.median(times)) * 1e3
    else:
        ms = total / max(n - 1, 1) * 1e3

    # ANSI assembly cost on a host-side buffer (no device involvement)
    rgb = (np.random.RandomState(0).rand(h, w, 3) * 255).astype(np.uint8)
    out = io.StringIO()
    disp = TermDisplay.__new__(TermDisplay)
    disp.out = out
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        disp.show(rgb, "status")
    ansi_ms = (time.time() - t0) / reps * 1e3

    fps = 1000.0 / (ms + ansi_ms)
    rec = {
        "resolution": f"{w}x{h}",
        "frame_ms_device_loop": round(ms, 1),
        "ansi_assembly_ms": round(ansi_ms, 1),
        "fps_end_to_end": round(fps, 2),
        "frames_measured": n - 1,
        "note": "device loop includes the ~25 ms tunnel dispatch constant "
                "per frame; a local chip would not pay it",
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/VIEWER_FPS_r05.json", "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
