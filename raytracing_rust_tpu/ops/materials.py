"""Batched material shading — masked dispatch over tagged material tables.

The reference dispatches `&dyn Material::scatter/emitted` per hit
(reference src/material.rs:30-33). Each lane here computes every material
branch with vector math and selects by tag — five cheap branches beat a
data-dependent gather/scatter reorder at this scale (material-sorted queues
are the Pallas-tier optimization).

All math mirrors the reference exactly, including its quirks:
* lambertian target = p + n + sphere_sample (src/material.rs:49-53);
* metal reflects the *normalized* incoming direction, fuzz perturbs, absorbs
  when the result leaves the hemisphere (src/material.rs:76-87);
* dielectric keeps the book's exit-cosine formula `ref_idx·d·n/|d|`
  (src/material.rs:108-115), Schlick reflectance (:25-28), and refracts the
  *unnormalized* d through a normalize inside refract() (:13-23);
* diffuse_light never scatters, emits its texture (src/material.rs:133-151);
* isotropic scatters uniformly in the ball (src/material.rs:153-173).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.scene import (SceneTables, MAT_LAMBERTIAN, MAT_METAL,
                            MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT)
from . import rng
from .textures import eval_texture


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _reflect(v, n):
    """reference src/material.rs:9-11"""
    return v - 2.0 * _dot(v, n)[..., None] * n


def _refract(v, n, ni_over_nt):
    """reference src/material.rs:13-23 → (refracted dir, possible mask)."""
    uv = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    dt = _dot(uv, n)
    disc = 1.0 - ni_over_nt * ni_over_nt * (1.0 - dt * dt)
    ok = disc > 0.0
    # double-where: sqrt'(0)=inf must not leak NaN into TIR lanes' gradients
    refracted = (ni_over_nt[..., None] * (uv - n * dt[..., None])
                 - n * jnp.sqrt(jnp.where(ok, disc, 1.0))[..., None])
    return refracted, ok


def _schlick(cosine, ref_idx):
    """reference src/material.rs:25-28"""
    r0 = ((1.0 - ref_idx) / (1.0 + ref_idx)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def emitted(scene: SceneTables, mat_id, u, v, p):
    """Per-lane emission (reference src/material.rs:148-150; zeros elsewhere)."""
    mtype = scene.mat_type[mat_id]
    e = eval_texture(scene, scene.mat_texture[mat_id], u, v, p)
    return jnp.where((mtype == MAT_DIFFUSE_LIGHT)[:, None], e,
                     jnp.zeros_like(e))


def scatter(scene: SceneTables, d_in, p, normal, u, v, mat_id,
            u_sphere, u_branch):
    """Batched Material::scatter.

    d_in[N,3] incoming (unnormalized) directions; u_sphere[N,3], u_branch[N]
    uniforms. Returns (new_dir[N,3], attenuation[N,3], ok[N]).
    New rays keep origin p and the parent ray's time (reference
    src/material.rs:50 Ray::new(hit.p, ..., ray.time())).
    """
    mtype = scene.mat_type[mat_id]
    param = scene.mat_param[mat_id]
    albedo = eval_texture(scene, scene.mat_texture[mat_id], u, v, p)
    sphere_sample = rng.in_unit_sphere(u_sphere)

    # -- lambertian: dir = n + unit-ball sample (src/material.rs:49-53)
    d_lamb = normal + sphere_sample

    # -- metal (src/material.rs:76-87)
    d_unit = d_in / jnp.linalg.norm(d_in, axis=-1, keepdims=True)
    refl = _reflect(d_unit, normal)
    refl = refl + param[:, None] * sphere_sample  # fuzz (0 ⇒ unchanged)
    metal_ok = _dot(refl, normal) > 0.0

    # -- dielectric (src/material.rs:105-126)
    # double-where: non-dielectric rows carry param 0, and the backward
    # of 1/ref_idx at 0 is -inf — a masked-out branch must still be
    # NaN-free or 0·inf poisons the mat_param gradient row
    ref_idx = jnp.where(mtype == MAT_DIELECTRIC, param, 1.0)
    d_dot_n = _dot(d_in, normal)
    d_len = jnp.linalg.norm(d_in, axis=-1)
    exiting = d_dot_n > 0.0
    outward_n = jnp.where(exiting[:, None], -normal, normal)
    ni_over_nt = jnp.where(exiting, ref_idx, 1.0 / ref_idx)
    cosine = jnp.where(exiting, ref_idx * d_dot_n / d_len, -d_dot_n / d_len)
    refracted, can_refract = _refract(d_in, outward_n, ni_over_nt)
    reflect_prob = jnp.where(can_refract, _schlick(cosine, ref_idx), 1.0)
    take_refract = can_refract & (u_branch >= reflect_prob)
    d_diel = jnp.where(take_refract[:, None], refracted, _reflect(d_in, normal))

    # -- isotropic: uniform ball direction (src/material.rs:164-168)
    d_iso = sphere_sample

    new_dir = jnp.where((mtype == MAT_LAMBERTIAN)[:, None], d_lamb,
              jnp.where((mtype == MAT_METAL)[:, None], refl,
              jnp.where((mtype == MAT_DIELECTRIC)[:, None], d_diel, d_iso)))

    white = jnp.ones_like(albedo)
    attenuation = jnp.where((mtype == MAT_DIELECTRIC)[:, None], white, albedo)

    ok = jnp.where(mtype == MAT_METAL, metal_ok,
                   mtype != MAT_DIFFUSE_LIGHT)
    return new_dir, attenuation, ok
