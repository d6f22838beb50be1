"""Frustum-corner pinhole camera with thin-lens DOF.

Reference: template/camera.h.  The camera basis/corner construction follows
HandleInput's final recompute (camera.h:163-178); primary-ray generation
follows GetPrimaryRay (camera.h:68-101).  Directions are returned
*normalized* (the reference Ray constructor normalizes, scene.cpp:85-97).
"""

from __future__ import annotations

import numpy as np

from voxtracer.core.mathx import normalize
from voxtracer.core.sampling import point_in_circle
from voxtracer.core.types import Camera


def make_camera(
    pos=(0.0, 0.0, -2.0),
    target=(0.0, 0.0, -1.0),
    aspect: float = 256.0 / 212.0,
    focal_distance: float = 1.0,
    defocus_jitter: float = 0.0,
) -> Camera:
    pos = np.asarray(pos, np.float32)
    target = np.asarray(target, np.float32)
    ahead = target - pos
    ahead = ahead / np.linalg.norm(ahead)
    tmp_up = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(tmp_up, ahead)
    right = right / np.linalg.norm(right)
    up = np.cross(ahead, right)
    up = up / np.linalg.norm(up)
    # final recompute as camera.h:173-178
    right = np.cross(up, ahead)
    right = right / np.linalg.norm(right)
    top_left = pos + 2 * ahead - aspect * right + up
    top_right = pos + 2 * ahead + aspect * right + up
    bottom_left = pos + 2 * ahead - aspect * right - up
    return Camera(
        pos=pos.astype(np.float32),
        top_left=top_left.astype(np.float32),
        top_right=top_right.astype(np.float32),
        bottom_left=bottom_left.astype(np.float32),
        right=right.astype(np.float32),
        up=up.astype(np.float32),
        ahead=ahead.astype(np.float32),
        focal_distance=np.float32(focal_distance),
        defocus_jitter=np.float32(defocus_jitter),
    )


def primary_rays(cam: Camera, width: int, height: int, px, py, lens_u, xp):
    """Generate primary rays for pixel coordinates.

    px, py: [...] float pixel coords (may include AA jitter already).
    lens_u: [..., 2] uniforms for the thin-lens sample, or None for no-DOF
            (reference GetPrimaryRayNoDOF, camera.h:103-110).
    Returns (origins [..., 3], directions [..., 3] unit)."""
    u = px * (1.0 / width)
    v = py * (1.0 / height)
    p = (
        cam.top_left
        + u[..., None] * (cam.top_right - cam.top_left)
        + v[..., None] * (cam.bottom_left - cam.top_left)
    )
    if lens_u is None:
        origin = xp.broadcast_to(cam.pos, p.shape)
        direction = p - cam.pos
    else:
        jitter = point_in_circle(lens_u, xp) * cam.defocus_jitter / width
        focal = cam.pos + cam.focal_distance * normalize(p - cam.pos, xp)
        origin = cam.pos + jitter[..., 0:1] * cam.right + jitter[..., 1:2] * cam.up
        direction = focal - origin
    return origin, normalize(direction, xp)


def auto_focus_distance(cam: Camera, width: int, height: int, trace_center_t) -> float:
    """Autofocus support: the reference traces the center pixel each Tick and
    sets focalDistance to min(hit_t, 1e4) (renderer.cpp:1987-1991).
    `trace_center_t` is supplied by the renderer."""
    return float(min(trace_center_t, 1e4))
