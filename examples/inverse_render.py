#!/usr/bin/env python
"""Inverse rendering demo: recover a wall albedo by gradient descent.

Renders a target image of a cornell-style box, perturbs the tall box's
albedo, and optimizes it back with Adam on an L2 photometric loss —
gradients flow through the full path tracer (`trace(differentiable=True)`,
rematerialized bounce scan). This is the capability the reference renderer
fundamentally lacks: its scene parameters are opaque to any optimizer.

Runs anywhere (CPU included):  python examples/inverse_render.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raytracing_rust_tpu.models.scene import SceneBuilder, BG_BLACK
from raytracing_rust_tpu.ops.camera import make_camera
from raytracing_rust_tpu.ops.integrator import trace


def build_scene(box_albedo=(0.73, 0.73, 0.73)):
    b = SceneBuilder(background=BG_BLACK)
    white = b.lambertian(b.solid(0.73, 0.73, 0.73))
    b.rect("zx", -3, -3, 3, 3, 0.0, white)                       # floor
    b.rect("yz", 0, -3, 6, 3, -3.0, b.lambertian(b.solid(0.65, 0.05, 0.05)))
    b.rect("yz", 0, -3, 6, 3, 3.0, b.lambertian(b.solid(0.12, 0.45, 0.15)),
           flip=True)
    b.rect("zx", -2, -2, 2, 2, 5.9, b.diffuse_light(b.solid(5, 5, 5)),
           flip=True)
    box_mat = b.lambertian(b.solid(*box_albedo))
    b.cube((-1.0, 0.0, -1.0), (1.0, 2.5, 1.0), box_mat)
    return b.build()


def rays(n, key):
    o = jnp.tile(jnp.asarray([[0.0, 3.0, 9.0]]), (n, 1))
    cam = make_camera((0, 3, 9), (0, 1.5, 0), (0, 1, 0), 45.0, 1.0, 0.0, 9.0)
    u = jax.random.uniform(key, (n, 2))
    s, t = u[:, 0], u[:, 1]
    from raytracing_rust_tpu.ops.camera import get_rays
    return get_rays(cam, s, t, jnp.zeros((n, 3)))


def main():
    n = 8192
    key = jax.random.key(0)
    o, d, time = rays(n, jax.random.fold_in(key, 1))

    target_scene = build_scene((0.2, 0.5, 0.8))  # ground-truth blue-ish box

    scene = build_scene((0.5, 0.5, 0.5))  # start grey
    # the box material's texture is the last solid added before the cube
    box_tex = int(np.asarray(scene.mat_texture)[-1])

    def loss_fn(albedo, k):
        # target and candidate share the SAME sample paths per step:
        # an L2 between two INDEPENDENT MC estimates would reward variance
        # reduction (darker albedo = less noise) over matching the mean
        target = trace(target_scene, o, d, time, k, max_depth=6,
                       differentiable=True)
        s2 = type(scene)(**{**scene.__dict__,
                            "tex_color": scene.tex_color.at[box_tex]
                            .set(albedo)})
        rad = trace(s2, o, d, time, k, max_depth=6, differentiable=True)
        return jnp.mean((rad - jax.lax.stop_gradient(target)) ** 2)

    albedo = jnp.asarray([0.5, 0.5, 0.5])
    opt = optax.adam(0.05)
    state = opt.init(albedo)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    print(f"target albedo: [0.20 0.50 0.80], start: {np.asarray(albedo)}")
    for step in range(60):
        k = jax.random.fold_in(key, 100 + step)
        loss, g = grad_fn(albedo, k)
        updates, state = opt.update(g, state)
        albedo = jnp.clip(optax.apply_updates(albedo, updates), 0.0, 1.0)
        if step % 10 == 0 or step == 59:
            a = np.asarray(albedo)
            print(f"step {step:3d}  loss {float(loss):.5f}  "
                  f"albedo [{a[0]:.3f} {a[1]:.3f} {a[2]:.3f}]")

    a = np.asarray(albedo)
    err = np.abs(a - np.array([0.2, 0.5, 0.8])).max()
    print(f"recovered albedo [{a[0]:.3f} {a[1]:.3f} {a[2]:.3f}] "
          f"(max abs err {err:.3f})")
    return 0 if err < 0.08 else 1


if __name__ == "__main__":
    sys.exit(main())
