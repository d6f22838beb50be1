"""Interactive live viewer — the TPU-native analogue of the reference's
GLFW window + fly camera + ImGui edit loop (template.cpp:296-329,
camera.h:113-181, renderer.cpp:2348-2971).

No GL and no window system in this environment, so the "surface" is the
terminal: frames draw as ANSI truecolor half-blocks (one character cell =
two stacked pixels), giving a live progressive image in any modern
terminal.  Input is raw non-blocking keyboard reads (termios + select) —
WASD/QE fly, arrow keys look, exactly the reference key map.  Any camera
move or live material edit resets the progressive accumulator, the same
rule as every ImGui callback in the reference (renderer.cpp:343).

A scripted mode (`keys` iterable + display off) drives the identical loop
headlessly so the viewer is testable without a TTY.
"""

from __future__ import annotations

import sys
import time

import numpy as np


# ---------------------------------------------------------------- terminal IO

class KeyReader:
    """Non-blocking raw keyboard input.  Terminals deliver key *presses*
    (no key-up), so each frame consumes all pending bytes and treats them
    as that frame's held-key set."""

    ARROWS = {"A": "up", "B": "down", "C": "right", "D": "left"}

    def __init__(self):
        import termios
        import tty

        self.fd = sys.stdin.fileno()
        self.saved = termios.tcgetattr(self.fd)
        tty.setcbreak(self.fd)

    def close(self):
        import termios

        termios.tcsetattr(self.fd, termios.TCSADRAIN, self.saved)

    def poll(self) -> set:
        import select

        keys = set()
        while select.select([sys.stdin], [], [], 0)[0]:
            ch = sys.stdin.read(1)
            if ch == "\x1b":  # escape sequence (arrow) or bare ESC
                if select.select([sys.stdin], [], [], 0)[0]:
                    seq = sys.stdin.read(1)
                    if seq == "[" and select.select([sys.stdin], [], [], 0)[0]:
                        keys.add(self.ARROWS.get(sys.stdin.read(1), "esc"))
                else:
                    keys.add("esc")
            elif ch:
                keys.add(ch.lower())
        return keys


class TermDisplay:
    """ANSI truecolor half-block framebuffer (2 pixels per text row)."""

    def __init__(self):
        self.out = sys.stdout
        self.out.write("\x1b[?1049h\x1b[?25l")  # alt screen, hide cursor

    def close(self):
        self.out.write("\x1b[?25h\x1b[?1049l")
        self.out.flush()

    def show(self, rgb8: np.ndarray, status: str):
        h, w, _ = rgb8.shape
        lines = ["\x1b[H"]
        for y in range(0, h - 1, 2):
            top, bot = rgb8[y], rgb8[y + 1]
            row = []
            for x in range(w):
                tr, tg, tb = top[x]
                br, bg, bb = bot[x]
                row.append(f"\x1b[38;2;{tr};{tg};{tb}m"
                           f"\x1b[48;2;{br};{bg};{bb}m▀")
            lines.append("".join(row) + "\x1b[0m\x1b[K")
        lines.append("\x1b[0m" + status + "\x1b[K")
        self.out.write("\n".join(lines))
        self.out.flush()


# ------------------------------------------------------------------ live loop

def _make_live_step():
    """ONE fused jitted dispatch per frame: render sample -> progressive
    lerp -> Reinhard-Jodie -> uint8.  Every separate eager op through the
    device tunnel costs a ~25 ms round trip (PERF_NOTES.md), so the frame
    loop ships exactly one program and pulls exactly one small uint8
    image."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from voxtracer.render.integrator import render
    from voxtracer.render.tonemap import to_rgb8

    @partial(jax.jit, static_argnames=("cfg", "spp"))
    def step(scene, cfg, acc, n_frames, key, spp):
        img = render(scene, cfg, key, spp)
        w = 1.0 / (n_frames.astype(jnp.float32) + 1.0)
        acc = acc * (1.0 - w) + img * w
        return acc, to_rgb8(acc)

    return step


def run_live(scene, cfg, *, max_frames: int = 0, script=None,
             display: bool = True, spp: int = 1, seed: int = 0,
             edit_material: int = 6):
    """The frame loop (template.cpp:296-329 analogue).

    script: optional iterable of per-frame key sets (headless driving);
    when given and display is False, no TTY is needed.
    Returns (frames_rendered, report) for the caller/tests.
    """
    import jax
    import jax.numpy as jnp

    from voxtracer.render.flycam import FlyState, handle_input, to_camera
    from voxtracer.utils.profiling import FrameReport

    scene = jax.tree.map(jnp.asarray, scene)
    fly = FlyState.from_camera(scene.camera)
    aspect = cfg.width / cfg.height
    live_step = _make_live_step()
    acc = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    n_acc = 0
    # per-frame stats go to the HUD line, not stderr, when displaying
    import io

    report = FrameReport(cfg.width, cfg.height,
                         stream=io.StringIO() if display else sys.stderr)
    key = jax.random.PRNGKey(seed)

    reader = disp = None
    if display:
        disp = TermDisplay()
        if script is None:
            reader = KeyReader()
    script_it = iter(script) if script is not None else None

    frame = 0
    dt_ms = 33.0
    try:
        while True:
            if max_frames and frame >= max_frames:
                break
            t0 = time.time()
            if script_it is not None:
                try:
                    keys = set(next(script_it))
                except StopIteration:
                    break
            elif reader is not None:
                keys = reader.poll()
            else:
                keys = set()
            if "esc" in keys or "x" in keys:
                break

            edited = False
            if "m" in keys:  # live material edit (ImGui MaterialEdit
                # analogue, renderer.cpp:2659): brighten the edit slot
                m = scene.materials
                alb = m.albedo.at[edit_material].mul(1.25)
                scene = scene.replace(materials=m.replace(albedo=alb))
                edited = True
            if "n" in keys:  # dim it back
                m = scene.materials
                alb = m.albedo.at[edit_material].mul(0.8)
                scene = scene.replace(materials=m.replace(albedo=alb))
                edited = True

            moved = handle_input(fly, keys, dt_ms, slow="shift" in keys)
            if moved:
                scene = scene.replace(camera=jax.tree.map(
                    jnp.asarray, to_camera(fly, aspect, scene.camera)))
            if moved or edited:
                n_acc = 0  # ResetAccumulator (renderer.cpp:343); weight
                # 1/(0+1)=1 overwrites acc, no device-side zeroing needed

            acc, rgb_dev = live_step(scene, cfg, acc,
                                     jnp.int32(n_acc),
                                     jax.random.fold_in(key, frame), spp)
            rgb = np.asarray(rgb_dev)
            n_acc += 1
            dt = time.time() - t0
            dt_ms = dt * 1000.0
            if not display:
                print(f"raw {dt_ms:.1f} ms keys={sorted(keys)}",
                      file=sys.stderr, flush=True)
            stats = report.frame(dt)
            if disp is not None:
                disp.show(rgb, f"{stats['ms']:.1f}ms ({stats['fps']:.1f}fps) "
                               f"{stats['mrays_s']:.2f}Mrays/s  "
                               f"spp={n_acc} "
                               f"pos=({fly.pos[0]:.1f},{fly.pos[1]:.1f},"
                               f"{fly.pos[2]:.1f})  [wasd/qe/arrows, "
                               f"m/n edit, x quit]")
            frame += 1
    finally:
        if reader is not None:
            reader.close()
        if disp is not None:
            disp.close()
    return frame, report
