"""CPU-side megakernel tripwire (VERDICT.md round-1 task 2).

Round 1 shipped a kernel that failed at Python *trace* time (undefined
names, tuple-unpack arity, pallas_call input-count mismatch) while the CPU
suite stayed green, because nothing off-TPU ever built or traced the kernel.

`jax.eval_shape` binds the `pallas_call` primitive, which traces the kernel
body to a jaxpr WITHOUT lowering it — so the TPU-only core PRNG
(`pltpu.prng_seed`, no CPU lowering) is never a problem, but every
trace-time Python error in the kernel (the exact class of round-1 breakage)
fails loudly here. Every megakernel-capable preset must trace, with and
without the optional features (media, dynamic loop, russian roulette,
multi-tile grids).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_rust_tpu.models import builders
from raytracing_rust_tpu.ops import pallas_tracer as pt

# every preset the megakernel claims to support (UnsupportedScene presets
# are asserted separately in test_pallas_record.py)
KERNEL_PRESETS = ["two_spheres", "cornell_box", "cornell_smoke",
                  "random_spheres", "two_perlin_spheres", "simple_light",
                  "earth", "final_scene"]


def _trace(scene, nx, ny, grid, rr_depth=None):
    (rec, kinds, groups, dyn, n_dyn, box, n_box, sclus, bclus, med,
     med_kinds, flags, img, attr) = pt.build_scene_record(scene)
    cam = np.zeros(pt.CAMREC, np.float32)
    params = jnp.zeros(4, jnp.int32)
    out = jax.eval_shape(
        lambda r, d, b, sc, bc, m, c, p, im, at: pt._trace_call(
            r, d, b, sc, bc, m, c, p, im, at, kinds, groups, n_dyn, n_box,
            len(sclus) if n_dyn else 0, len(bclus) if n_box else 0,
            med_kinds, flags, scene.background, nx, ny, grid, False,
            rr_depth),
        jnp.asarray(rec), jnp.asarray(dyn), jnp.asarray(box),
        jnp.asarray(sclus), jnp.asarray(bclus), jnp.asarray(med),
        jnp.asarray(cam), params, jnp.asarray(img), jnp.asarray(attr))
    assert out.shape == (3, grid * pt.SUB, pt.LANES)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize("name", KERNEL_PRESETS)
def test_kernel_traces(name):
    _trace(builders.PRESETS[name].build(), nx=256, ny=128, grid=4)


def test_kernel_traces_with_rr_and_multitile():
    # russian-roulette branch + >1 tile grid + non-multiple-of-TILE image
    _trace(builders.cornell_box(), nx=200, ny=200, grid=5, rr_depth=6)


def test_render_pallas_host_path_cpu_interpret():
    """Drive render_pallas end-to-end host logic (grid math, device split,
    spp chunking, gamma) — everything up to and around the kernel — by
    monkeypatching the jitted _trace_call with a shape-faithful stub.

    This pins the host-side names (grid, n_pix, per-device bounds) that
    round 1 deleted by accident.
    """
    scene = builders.two_spheres()
    cam = builders.PRESETS["two_spheres"].camera()
    real = pt._trace_call

    def fake_trace(rec, dyn, box, sclus, bclus, med, camr, params, img,
                   attr, kinds, groups, n_dyn, n_box, n_sclus, n_bclus,
                   med_kinds, flags, background, nx, ny, grid,
                   interpret=False, rr_depth=None, perlin_seed=0):
        spp = int(params[1])
        return jnp.full((3, grid * pt.SUB, pt.LANES), 0.25 * spp,
                        jnp.float32)

    pt._trace_call = fake_trace
    try:
        img = pt.render_pallas(scene, cam, nx=160, ny=90, spp=8,
                               spp_chunk=4, devices=jax.devices("cpu")[:2])
    finally:
        pt._trace_call = real
    assert img.shape == (90, 160, 3)
    # sums/spp = 0.25 → sqrt = 0.5 everywhere
    np.testing.assert_allclose(img, 0.5, atol=1e-6)
