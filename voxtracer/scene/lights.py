"""Light bank builders (reference: src/Lighting/*.h defaults +
Renderer::SetUpLights, renderer.cpp:93-100)."""

from __future__ import annotations

import numpy as np

from voxtracer.core.types import Lights


def make_lights(
    point=((0.5, 0.5, 3.5, 1.0, 1.0, 1.0),),
    spot=(),
    area=(),
    directional=((1.0, 0.0, 0.0), (0.0, 0.0, 0.0)),
) -> Lights:
    """point: iterable of (px,py,pz, r,g,b);
    spot: iterable of (px,py,pz, dx,dy,dz, r,g,b, cos_angle);
    area: iterable of (px,py,pz, r,g,b, mult, radius);
    directional: (direction, color) — always present (lightCount includes
    it unconditionally, renderer.cpp:2295)."""
    point = np.asarray(point, np.float32).reshape(-1, 6)
    spot = np.asarray(spot, np.float32).reshape(-1, 10)
    area = np.asarray(area, np.float32).reshape(-1, 8)
    return Lights(
        point_pos=np.ascontiguousarray(point[:, 0:3]),
        point_color=np.ascontiguousarray(point[:, 3:6]),
        spot_pos=np.ascontiguousarray(spot[:, 0:3]),
        spot_dir=np.ascontiguousarray(spot[:, 3:6]),
        spot_color=np.ascontiguousarray(spot[:, 6:9]),
        spot_cos_angle=np.ascontiguousarray(spot[:, 9]),
        area_pos=np.ascontiguousarray(area[:, 0:3]),
        area_color=np.ascontiguousarray(area[:, 3:6]),
        area_mult=np.ascontiguousarray(area[:, 6]),
        area_radius=np.ascontiguousarray(area[:, 7]),
        dir_direction=np.asarray(directional[0], np.float32),
        dir_color=np.asarray(directional[1], np.float32),
    )


def default_spot() -> tuple:
    """SpotLight defaults (src/Lighting/SpotLight.h:22): pos (-1,.5,-1),
    dir (1,0,0), color 1.5 uniform, angle cos(45 deg)."""
    c45 = float(np.cos(np.deg2rad(45.0)))
    return (-1.0, 0.5, -1.0, 1.0, 0.0, 0.0, 1.5, 1.5, 1.5, c45)


def default_lights() -> Lights:
    """SetUpLights: 1 point + 5 default spots + dark directional
    (renderer.cpp:93-100)."""
    return make_lights(spot=tuple(default_spot() for _ in range(5)))
