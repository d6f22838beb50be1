"""TLAS: BVH over voxel-volume instances — SURVEY.md §2 #7.

The reference ships a midpoint-split BVH (src/BVH/BasicBVH.{h,cpp}, from
Bikker's tutorial) but never queries it — its render path linearly scans
every instance (renderer.cpp:946-1018).  Here the BVH is real: built
host-side over the instances' WORLD-space AABBs, traversed on device by a
stack-based wavefront kernel (kernels/tlas.py).

In the dense-wavefront regime the fused traversal already slab-tests every
ray x volume pair exactly (kernels/dda.py _setup), so the BVH's win arrives
with ray-packet compaction; it is provided as a first-class component and
used by the `bvh_candidates` prefilter."""

from __future__ import annotations

import numpy as np

from voxtracer.core.types import VoxVolumes


def instance_world_aabbs(volumes: VoxVolumes):
    """World-space AABB per instance: the 8 object-space cube corners
    [cube_min, cube_min+1] pushed through the fwd transform."""
    v = volumes.n
    lo = np.zeros((v, 3), np.float32)
    hi = np.zeros((v, 3), np.float32)
    for i in range(v):
        b0 = np.asarray(volumes.cube_min[i], np.float32)
        corners = np.array([[b0[0] + x, b0[1] + y, b0[2] + z]
                            for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                           np.float32)
        m = np.asarray(volumes.fwd[i], np.float32)
        world = corners @ m[:3, :3].T + m[:3, 3]
        lo[i] = world.min(axis=0)
        hi[i] = world.max(axis=0)
    return lo, hi


def build_tlas(lo: np.ndarray, hi: np.ndarray):
    """Midpoint-split binary BVH (BasicBVH::Subdivide, BasicBVH.cpp:98-136
    strategy): returns flat arrays sized 2V-1 max.

    node arrays: nmin/nmax [M, 3]; left [M] (child index, -1 for leaf);
    first/count [M] (leaf range into `order`), order [V] instance ids.
    Right child is always left+1 (contiguous pair layout)."""
    v = lo.shape[0]
    centroids = (lo + hi) * 0.5
    order = np.arange(v)
    m_max = max(1, 2 * v - 1)
    nmin = np.zeros((m_max, 3), np.float32)
    nmax = np.zeros((m_max, 3), np.float32)
    left = np.full(m_max, -1, np.int32)
    first = np.zeros(m_max, np.int32)
    count = np.zeros(m_max, np.int32)
    n_nodes = [1]

    def update_bounds(node, f, c):
        idx = order[f:f + c]
        nmin[node] = lo[idx].min(axis=0)
        nmax[node] = hi[idx].max(axis=0)
        first[node] = f
        count[node] = c

    def subdivide(node, f, c):
        update_bounds(node, f, c)
        if c <= 2:
            return
        ext = nmax[node] - nmin[node]
        axis = int(np.argmax(ext))
        split = nmin[node][axis] + ext[axis] * 0.5
        seg = order[f:f + c]
        is_left = centroids[seg, axis] < split
        n_left = int(is_left.sum())
        if n_left == 0 or n_left == c:  # midpoint failed -> median split
            key = np.argsort(centroids[seg, axis], kind="stable")
            order[f:f + c] = seg[key]
            n_left = c // 2
        else:
            order[f:f + c] = np.concatenate([seg[is_left], seg[~is_left]])
        l = n_nodes[0]
        n_nodes[0] += 2
        left[node] = l
        count[node] = 0
        subdivide(l, f, n_left)
        subdivide(l + 1, f + n_left, c - n_left)

    subdivide(0, 0, v)
    m = n_nodes[0]
    return dict(nmin=nmin[:m], nmax=nmax[:m], left=left[:m],
                first=first[:m], count=count[:m],
                order=order.astype(np.int32))
