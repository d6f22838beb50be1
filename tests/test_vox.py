"""Unit tests for the pure-NumPy .vox parser (voxtracer/io/vox.py)."""

import numpy as np
import pytest

from voxtracer.io.vox import load_vox, parse_vox


def _make_vox(sx, sy, sz, voxels, palette=None, imap=None, version=150):
    """Hand-assemble a minimal .vox byte stream."""
    import struct

    def chunk(cid, content, children=b""):
        return cid + struct.pack("<ii", len(content), len(children)) + content + children

    size = chunk(b"SIZE", struct.pack("<iii", sx, sy, sz))
    xyzi = chunk(
        b"XYZI",
        struct.pack("<i", len(voxels)) + b"".join(bytes(v) for v in voxels),
    )
    children = size + xyzi
    if palette is not None:
        children += chunk(b"RGBA", bytes(np.asarray(palette, np.uint8).ravel()))
    if imap is not None:
        children += chunk(b"IMAP", bytes(np.asarray(imap, np.uint8)))
    main = chunk(b"MAIN", b"", children)
    return b"VOX " + struct.pack("<i", version) + main


def test_parse_simple():
    # one voxel at (1, 0, 2) with color index 5
    pal = np.zeros((256, 4), np.uint8)
    pal[:, 3] = 255
    pal[4] = [10, 20, 30, 255]  # chunk position 4 -> color index 5 after rotation
    data = _make_vox(3, 2, 4, [(1, 0, 2, 5)], palette=pal)
    (m,) = parse_vox(data)
    assert m.size == (3, 2, 4)
    assert m.grid[1, 0, 2] == 5
    assert m.grid.sum() == 5  # single voxel
    np.testing.assert_allclose(m.palette[5], np.array([10, 20, 30, 255]) / 255.0)
    assert m.palette[0, 3] == 0.0  # index 0 transparent


def test_parse_rejects_bad_magic():
    with pytest.raises(ValueError):
        parse_vox(b"NOPE" + b"\0" * 32)


def test_imap_roundtrip_color():
    # IMAP permutes indices but each voxel must keep its RGBA color.
    rng = np.random.RandomState(0)
    pal = rng.randint(0, 255, (256, 4)).astype(np.uint8)
    imap = np.arange(256, dtype=np.uint8)
    rng.shuffle(imap[1:])  # display order permutation, slot 0 untouched
    raw_index = 7
    plain = parse_vox(_make_vox(1, 1, 1, [(0, 0, 0, raw_index)], palette=pal))[0]
    mapped = parse_vox(_make_vox(1, 1, 1, [(0, 0, 0, raw_index)], palette=pal, imap=imap))[0]
    color_plain = plain.palette[plain.grid[0, 0, 0]]
    color_mapped = mapped.palette[mapped.grid[0, 0, 0]]
    np.testing.assert_allclose(color_plain, color_mapped)


@pytest.mark.parametrize(
    "name,size",
    [
        ("teapot.vox", (126, 80, 61)),
        ("room.vox", None),
        ("monu1.vox", None),
        ("player.vox", None),
    ],
)
def test_load_reference_assets(assets_dir, name, size):
    m = load_vox(str(assets_dir / name))
    assert m.grid.ndim == 3
    assert m.grid.max() > 0  # non-empty model
    assert m.palette.shape == (256, 4)
    if size is not None:
        assert m.size == size
    # solid voxels reference non-transparent palette entries
    occupied = np.unique(m.grid[m.grid > 0])
    assert occupied.size > 0


def test_all_assets_parse(assets_dir):
    import glob

    for path in sorted(glob.glob(str(assets_dir / "*.vox"))):
        m = load_vox(path)
        assert m.grid.any(), path
