"""Batched texture evaluation over tagged texture tables.

The reference dispatches `dyn Texture::value(u, v, p)` per hit
(reference src/texture.rs:4-6). Here every lane evaluates its texture via a
masked select over the four texture kinds; checker resolves its child id first
(one level — the reference only ever nests solids under checker,
tests/test.rs:93-101), so a second leaf-eval pass covers it.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.scene import SceneTables, TEX_CHECKER, TEX_NOISE, TEX_IMAGE
from . import perlin


def eval_texture(scene: SceneTables, tex_id, u, v, p):
    """RGB for lanes: tex_id[N], u[N], v[N], p[N,3] → [N,3]."""
    # checker indirection (reference src/texture.rs:40-47):
    # sin(10x)·sin(10y)·sin(10z) < 0 ? odd : even
    ttype = scene.tex_type[tex_id]
    sp = jnp.sin(10.0 * p)
    sines = sp[:, 0] * sp[:, 1] * sp[:, 2]
    child = jnp.where(sines < 0.0, scene.tex_child[tex_id, 0],
                      scene.tex_child[tex_id, 1])
    tex_id = jnp.where(ttype == TEX_CHECKER, child, tex_id)
    ttype = scene.tex_type[tex_id]

    out = scene.tex_color[tex_id]  # TEX_SOLID (reference src/texture.rs:21-24)

    if scene.has_noise_tex:
        # marble: 0.5·(1 + sin(scale·p.x + 5·turb(p,7))) (src/texture.rs:66-70)
        turb = perlin.turb(p, depth=7, seed=scene.perlin_seed)
        marble = 0.5 * (1.0 + jnp.sin(scene.tex_scale[tex_id] * p[:, 0]
                                      + 5.0 * turb))
        out = jnp.where((ttype == TEX_NOISE)[:, None], marble[:, None], out)

    if scene.has_image_tex:
        # nearest-neighbor, v flipped, clamp-to-edge (src/texture.rs:86-108)
        # — indexed with each image's TRUE dims, not the padded atlas dims
        img_id = scene.tex_image[tex_id]
        ny = scene.image_hw[img_id, 0]
        nx = scene.image_hw[img_id, 1]
        i = jnp.clip((u * nx).astype(jnp.int32), 0, nx - 1)
        j = jnp.clip(((1.0 - v) * ny).astype(jnp.int32), 0, ny - 1)
        texel = scene.images[img_id, j, i]
        out = jnp.where((ttype == TEX_IMAGE)[:, None], texel, out)

    return out
