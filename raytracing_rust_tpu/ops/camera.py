"""Thin-lens motion-blur camera (reference src/camera.rs).

The reference camera is an AoS struct with a scalar `get_ray(s, t)` making 3+
RNG draws (src/camera.rs:53-67). Here the camera is a small pytree and ray
generation is a batched pure function of pixel coordinates + uniforms, so XLA
fuses it into the render. Ray directions are deliberately left UNNORMALIZED —
the reference convention (SURVEY.md §3.3); all intersection/shading math is
written for unnormalized directions, exactly like the reference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import rng


@jax.tree_util.register_dataclass
@dataclass
class Camera:
    origin: jax.Array       # f32[3]
    lower_left: jax.Array   # f32[3]
    horizontal: jax.Array   # f32[3]
    vertical: jax.Array     # f32[3]
    u: jax.Array            # f32[3]  lens basis
    v: jax.Array            # f32[3]
    time0: jax.Array        # f32[]
    time1: jax.Array        # f32[]
    lens_radius: jax.Array  # f32[]


def make_camera(look_from, look_at, view_up, vertical_fov: float, aspect: float,
                aperture: float, focus_dist: float, time0: float = 0.0,
                time1: float = 0.0, dtype=jnp.float32) -> Camera:
    """Exactly the construction math at reference src/camera.rs:21-51."""
    look_from = jnp.asarray(look_from, dtype)
    look_at = jnp.asarray(look_at, dtype)
    view_up = jnp.asarray(view_up, dtype)

    theta = vertical_fov * math.pi / 180.0
    half_height = focus_dist * math.tan(theta / 2.0)
    half_width = aspect * half_height

    w = look_from - look_at
    w = w / jnp.linalg.norm(w)
    u = jnp.cross(view_up, w)
    u = u / jnp.linalg.norm(u)
    v = jnp.cross(w, u)

    return Camera(
        origin=look_from,
        lower_left=look_from - half_width * u - half_height * v - focus_dist * w,
        horizontal=2.0 * half_width * u,
        vertical=2.0 * half_height * v,
        u=u,
        v=v,
        time0=jnp.asarray(time0, dtype),
        time1=jnp.asarray(time1, dtype),
        lens_radius=jnp.asarray(aperture / 2.0, dtype),
    )


def get_rays(cam: Camera, s: jnp.ndarray, t: jnp.ndarray, u: jnp.ndarray):
    """Batched `get_ray` (reference src/camera.rs:53-67).

    s, t: f32[N] viewport coordinates in [0,1); u: f32[N, 3] uniforms
    (2 for the lens disk, 1 for shutter time). Returns (origin[N,3],
    direction[N,3], time[N]); directions unnormalized like the reference.
    """
    rd = cam.lens_radius * rng.in_unit_disk(u[..., 0:2])
    offset = rd[..., 0:1] * cam.u + rd[..., 1:2] * cam.v
    origin = cam.origin + offset
    time = cam.time0 + u[..., 2] * (cam.time1 - cam.time0)
    direction = (cam.lower_left + s[..., None] * cam.horizontal
                 + t[..., None] * cam.vertical - origin)
    return origin, direction, time
