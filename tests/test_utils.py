"""Utils: profiling report, checkpoint/resume, accumulator, image IO."""

import io

import numpy as np
import jax.numpy as jnp

from voxtracer.io.image import read_png, write_png
from voxtracer.render.accumulate import ProgressiveState
from voxtracer.utils.checkpoint import load_pytree, save_pytree
from voxtracer.utils.profiling import Counters, FrameReport, Timer


def test_frame_report_running_average():
    buf = io.StringIO()
    rep = FrameReport(256, 212, stream=buf)
    s1 = rep.frame(0.010)
    assert s1["ms"] == 10.0  # alpha starts at 1
    s2 = rep.frame(0.020)
    assert 10.0 < s2["ms"] < 20.0  # decayed blend
    assert "Mrays/s" in buf.getvalue()


def test_counters_emit():
    buf = io.StringIO()
    c = Counters(stream=buf)
    c.add("rays", 100)
    c.add("rays", 50)
    c.emit(frame=1)
    assert '"rays": 150' in buf.getvalue()
    assert c.data == {}


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": jnp.ones(4)}}
    p = str(tmp_path / "ck.npz")
    save_pytree(p, tree)
    back = load_pytree(p, tree)
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["b"]["c"], np.ones(4))


def test_progressive_accumulator_matches_mean():
    rng = np.random.default_rng(0)
    frames = [rng.random((4, 4, 3)).astype(np.float32) for _ in range(5)]
    prog = ProgressiveState(4, 4)
    for f in frames:
        acc = prog.add(jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(acc), np.mean(frames, axis=0),
                               rtol=1e-5)
    prog.reset()
    assert prog.frames == 0 and float(np.asarray(prog.acc).sum()) == 0.0


def test_png_roundtrip(tmp_path):
    img = np.random.default_rng(1).integers(0, 255, (12, 17, 3)).astype(np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)
