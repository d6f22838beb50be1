"""Native C++ IO runtime parity tests (native/voxio.cpp via ctypes)."""

import glob

import numpy as np
import pytest

from voxtracer import native
from voxtracer.io.vox import parse_vox
from voxtracer.scene import instances

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib not built")


@needs_native
def test_native_parser_bit_identical(assets_dir):
    for path in sorted(glob.glob(str(assets_dir / "*.vox"))):
        data = open(path, "rb").read()
        grid_n, pal_n = native.parse_vox_native(data)
        py = parse_vox(data)[0]
        assert np.array_equal(grid_n, py.grid), path
        np.testing.assert_allclose(pal_n, py.palette, atol=1e-7)


@needs_native
def test_native_bricks_match_python():
    rng = np.random.default_rng(1)
    for g in (8, 32, 64):
        grid = np.where(rng.random((g, g, g)) < 0.15,
                        rng.integers(0, 16, (g, g, g)), 255).astype(np.uint8)
        # bypass the native fast path inside build_bricks for the reference
        nat = native.build_bricks_native(grid, g)
        m = max(1, -(-g // 8))
        ref = np.full((m, m, m), -1, np.int32)
        for bx in range(m):
            for by in range(m):
                for bz in range(m):
                    sub = grid[bx * 8:(bx + 1) * 8, by * 8:(by + 1) * 8,
                               bz * 8:(bz + 1) * 8]
                    if sub.min() == sub.max():
                        ref[bx, by, bz] = sub.min()
        assert np.array_equal(nat, ref), g


@needs_native
def test_native_png_roundtrip(tmp_path):
    from voxtracer.io.image import read_png

    img = np.random.default_rng(0).integers(0, 255, (20, 30, 3)).astype(np.uint8)
    path = str(tmp_path / "t.png")
    assert native.write_png_native(path, img)
    back = read_png(path)
    assert np.array_equal(back, img)
