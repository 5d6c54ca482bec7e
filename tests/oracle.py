"""Scalar NumPy oracle: exact re-implementation of the reference math.

The reference has zero unit tests and its two checked-in golden PPMs are
all-black junk (SURVEY.md §4; verified: every pixel of
/root/reference/output/*.ppm is `0 0 0`). So parity is checked against this
scalar float64 oracle, which transcribes the reference formulas one-to-one
(citations inline). Deterministic pieces (intersection, reflect/refract,
textures, perlin given fixed tables) are compared exactly; stochastic pieces
are compared distributionally in the test files.
"""

from __future__ import annotations

import math

import numpy as np


# -- intersection ------------------------------------------------------------

def sphere_hit(center, radius, o, d, t_min, t_max, time=None, c1=None,
               t0=0.0, t1=1.0):
    """reference src/sphere.rs:37-77 (+ moving center :115-118 when c1 given).
    Returns (t, p, normal, u, v) or None."""
    center = np.asarray(center, float)
    if c1 is not None:
        center = center + ((time - t0) / (t1 - t0)) * (np.asarray(c1) - center)
    oc = o - center
    a = d @ d
    b = oc @ d
    c = oc @ oc - radius ** 2
    disc = b * b - a * c
    if disc > 0:
        for t in ((-b - math.sqrt(disc)) / a, (-b + math.sqrt(disc)) / a):
            if t_min < t < t_max:
                p = o + t * d
                n = (p - center) / radius
                u, v = sphere_uv(n)
                return t, p, n, u, v
    return None


def sphere_uv(n, compat_bug=False):
    """reference src/sphere.rs:9-15. compat_bug=True reproduces the FRAC_2_PI
    constant (2/π) the reference uses where the formula wants π/2."""
    phi = math.atan2(n[2], n[0])
    theta = math.asin(min(1.0, max(-1.0, n[1])))
    u = 1.0 - (phi + math.pi) / (2.0 * math.pi)
    k = (2.0 / math.pi) if compat_bug else (math.pi / 2.0)
    v = (theta + k) / math.pi
    return u, v


_PLANE_AXES = {"yz": (0, 1, 2), "zx": (1, 2, 0), "xy": (2, 0, 1)}


def rect_hit(plane, a0, b0, a1, b1, k, o, d, t_min, t_max):
    """reference src/rect.rs:39-69. Returns (t, p, normal, u, v) or None."""
    ka, aa, ba = _PLANE_AXES[plane]
    if d[ka] == 0:
        # deviation: the reference computes t = 0/0 = NaN here and the
        # NaN fails its range checks as a MISS in practice (rect.rs:45-47
        # comparisons are false for NaN) — returning None is the same
        # verdict without the NaN round-trip
        return None
    t = (k - o[ka]) / d[ka]
    if t < t_min or t > t_max:
        return None
    x = o[aa] + t * d[aa]
    y = o[ba] + t * d[ba]
    if x < a0 or x > a1 or y < b0 or y > b1:
        return None
    u = (x - a0) / (a1 - a0)
    v = (y - b0) / (b1 - b0)
    n = np.zeros(3)
    n[ka] = 1.0
    return t, o + t * d, n, u, v


_ROT_AXES = {"x": (0, 1, 2), "y": (1, 2, 0), "z": (2, 0, 1)}


def rotate_ray_in(axis, sin_t, cos_t, o, d):
    """world→object ray rotation, reference src/rotate.rs:87-97."""
    _, aa, ba = _ROT_AXES[axis]
    o2, d2 = o.copy(), d.copy()
    o2[aa] = cos_t * o[aa] + sin_t * o[ba]
    o2[ba] = -sin_t * o[aa] + cos_t * o[ba]
    d2[aa] = cos_t * d[aa] + sin_t * d[ba]
    d2[ba] = -sin_t * d[aa] + cos_t * d[ba]
    return o2, d2


def rotate_point_out(axis, sin_t, cos_t, p):
    """object→world point/normal rotation, reference src/rotate.rs:100-112."""
    _, aa, ba = _ROT_AXES[axis]
    p2 = p.copy()
    p2[aa] = cos_t * p[aa] - sin_t * p[ba]
    p2[ba] = sin_t * p[aa] + cos_t * p[ba]
    return p2


# -- materials ----------------------------------------------------------------

def reflect(v, n):
    """reference src/material.rs:9-11"""
    return v - 2.0 * (v @ n) * n


def refract(v, n, ni_over_nt):
    """reference src/material.rs:13-23 → refracted or None."""
    uv = v / np.linalg.norm(v)
    dt = uv @ n
    disc = 1.0 - ni_over_nt ** 2 * (1.0 - dt * dt)
    if disc > 0:
        return ni_over_nt * (uv - n * dt) - n * math.sqrt(disc)
    return None


def schlick(cosine, ref_idx):
    """reference src/material.rs:25-28"""
    r0 = ((1.0 - ref_idx) / (1.0 + ref_idx)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def dielectric_setup(d, n, ref_idx):
    """outward-normal/eta/cosine selection, reference src/material.rs:108-115.
    Returns (outward_n, ni_over_nt, cosine)."""
    if d @ n > 0:
        return -n, ref_idx, ref_idx * (d @ n) / np.linalg.norm(d)
    return n, 1.0 / ref_idx, -(d @ n) / np.linalg.norm(d)


# -- textures ------------------------------------------------------------------

def checker_value(odd, even, p):
    """reference src/texture.rs:40-47"""
    s = math.sin(10 * p[0]) * math.sin(10 * p[1]) * math.sin(10 * p[2])
    return odd if s < 0 else even


def image_value(data, u, v):
    """reference src/texture.rs:86-108; data float [ny, nx, 3] in [0,1]."""
    ny, nx, _ = data.shape
    i = min(int(u * nx), nx - 1)
    j = min(int((1.0 - v) * ny), ny - 1)
    return data[j, i]


def _perlin_gradient(ci, cj, ck, seed=0):
    """Scalar mirror of ops/perlin._gradient (hash-derived unit vector
    replacing the reference's random tables, reference src/perlin.rs:12-26 —
    see the ops/perlin.py module docstring for the rationale)."""
    M = 0xFFFFFFFF
    h = (((ci * 0x8DA6B343) & M) ^ ((cj * 0xD8163841) & M)
         ^ ((ck * 0xCB1AB31F) & M) ^ ((seed * 0x27D4EB2F) & M))
    h ^= h >> 13
    h = (h * 0x9E3779B1) & M
    h ^= h >> 16
    g = ((h ^ 0x85EBCA6B) * 0xC2B2AE35) & M
    g ^= g >> 16
    u1 = np.float32(h >> 8) * np.float32(1.0 / (1 << 24))
    u2 = np.float32(g >> 8) * np.float32(1.0 / (1 << 24))
    cz = 2.0 * float(u1) - 1.0
    sz = math.sqrt(max(0.0, 1.0 - cz * cz))
    phi = 2.0 * math.pi * float(u2)
    return np.array([sz * math.cos(phi), sz * math.sin(phi), cz])


def perlin_noise(p, seed=0):
    """reference src/perlin.rs:58-97 with canonical signed floor and
    hash-derived gradients (the deliberate deviations documented in
    ops/perlin.py)."""
    pf = np.floor(p)
    u, v, w = p - pf
    i, j, k = (int(x) for x in pf)
    uu = u * u * (3 - 2 * u)
    vv = v * v * (3 - 2 * v)
    ww = w * w * (3 - 2 * w)
    accum = 0.0
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                g = _perlin_gradient((i + di) & 255, (j + dj) & 255,
                                     (k + dk) & 255, seed)
                weight = np.array([u - di, v - dj, w - dk])
                accum += ((di * uu + (1 - di) * (1 - uu))
                          * (dj * vv + (1 - dj) * (1 - vv))
                          * (dk * ww + (1 - dk) * (1 - ww))
                          * (g @ weight))
    return accum


def perlin_turb(p, depth=7, seed=0):
    """reference src/perlin.rs:99-109"""
    accum, q, weight = 0.0, np.asarray(p, float).copy(), 1.0
    for _ in range(depth):
        accum += weight * perlin_noise(q, seed)
        weight *= 0.5
        q = q * 2.0
    return abs(accum)


# -- camera ---------------------------------------------------------------------

def camera_ray(look_from, look_at, vup, vfov, aspect, aperture, focus_dist,
               s, t, rd=(0.0, 0.0), time=0.0):
    """reference src/camera.rs:21-67 with injected lens sample rd (already in
    the unit disk) and shutter time. Returns (origin, direction)."""
    look_from = np.asarray(look_from, float)
    theta = vfov * math.pi / 180
    half_h = focus_dist * math.tan(theta / 2)
    half_w = aspect * half_h
    w = look_from - np.asarray(look_at, float)
    w /= np.linalg.norm(w)
    u = np.cross(np.asarray(vup, float), w)
    u /= np.linalg.norm(u)
    v = np.cross(w, u)
    lower_left = look_from - half_w * u - half_h * v - focus_dist * w
    horizontal = 2 * half_w * u
    vertical = 2 * half_h * v
    lens_r = aperture / 2
    origin = look_from + lens_r * (rd[0] * u + rd[1] * v)
    direction = lower_left + s * horizontal + t * vertical - origin
    return origin, direction
