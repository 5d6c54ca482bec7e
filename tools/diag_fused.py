#!/usr/bin/env python
"""Diagnose why the fused inverse-render step is slow on v5e.

Isolates, per hypothesis:
  A. recompile per call (JAX_LOG_COMPILES; same-arg repeat timing)
  B. jax.random.choice(replace=False) over 40k pixels inside jit
  C. the optimizer/clip tail
  D. grad with traced pix vs concrete pix
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rt")
os.environ["RT_IR_TPU"] = "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
import dataclasses  # noqa: E402

jax.config.update("jax_log_compiles", True)

from examples.inverse_render import (TRUE_ALBEDO, TRUE_EMIT,  # noqa: E402
                                     build_scene, cam, make_fused_step,
                                     param_tex_rows)
from raytracing_rust_tpu.parallel.sharding import (  # noqa: E402
    make_mesh, render_block_sharded, train_step_sharded)


def wall(label, fn, n=4):
    out = fn(0)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(i + 1)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"  {label:<40s} {dt * 1e3:8.1f} ms/call", flush=True)
    return dt


def main():
    devs = jax.devices()
    mesh = make_mesh(devs, dp=len(devs), sp=1)
    nx = ny = 200
    block, spp, depth = 4096, 64, 6
    n_pix = nx * ny

    target_scene = build_scene(TRUE_ALBEDO, TRUE_EMIT)
    scene = build_scene((0.5, 0.5, 0.5), 3.0)

    # B: the pixel choice alone
    @jax.jit
    def choice_only(i):
        kp = jax.random.fold_in(jax.random.key(1), i)
        return jax.random.choice(kp, n_pix, (block,),
                                 replace=False).astype(jnp.int32)

    wall("choice(replace=False) alone", lambda i: choice_only(
        jnp.asarray(i, jnp.uint32)))

    # D: target render with traced pix (from choice) vs concrete pix
    @jax.jit
    def tgt_traced(i):
        kp = jax.random.fold_in(jax.random.key(1), i)
        pix = jax.random.choice(kp, n_pix, (block,),
                                replace=False).astype(jnp.int32)
        k = jax.random.fold_in(jax.random.key(0), i)
        return render_block_sharded(target_scene, cam, pix, k, nx, ny,
                                    spp, depth, mesh)

    wall("target render, in-jit pix", lambda i: tgt_traced(
        jnp.asarray(i, jnp.uint32)))

    rng = np.random.default_rng(0)
    cpix = jnp.asarray(rng.choice(n_pix, size=block, replace=False)
                       .astype(np.int32))
    key = jax.random.key(7)
    wall("target render, concrete pix", lambda i: render_block_sharded(
        target_scene, cam, cpix, key, nx, ny, spp, depth, mesh))

    # full fused, same args repeated (feedback removed)
    light_tex, box_tex = param_tex_rows(scene)
    opt = optax.multi_transform(
        {"albedo": optax.adam(0.05), "emit": optax.adam(0.25)},
        {"albedo": "albedo", "emit": "emit"})
    # explicit f32 — weak-typed scalars risk a silent recompile on the
    # first post-warm call (see profile_train_step.py)
    params = {"albedo": jnp.asarray([0.5, 0.5, 0.5], jnp.float32),
              "emit": jnp.asarray(3.0, jnp.float32)}
    state = opt.init(params)
    fused = make_fused_step(target_scene, scene, cam, box_tex, light_tex,
                            nx, ny, spp, depth, mesh, block, opt)

    def same_args(i):
        p, s, loss = fused(params, state, jnp.asarray(1, jnp.uint32))
        return loss

    wall("fused, SAME args every call", same_args)

    def fb(i):
        nonlocal params, state
        params, state, loss = fused(params, state,
                                    jnp.asarray(i, jnp.uint32))
        return loss

    wall("fused, feedback (as in the loop)", fb)
    return 0


if __name__ == "__main__":
    sys.exit(main())
