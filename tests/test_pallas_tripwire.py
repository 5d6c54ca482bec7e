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
    (rec, kinds, groups, dyn, n_dyn, box, n_box, sclus, n_sclus, bclus,
     n_bclus, med, med_kinds, flags, img, attr, attr_fields, int_rec,
     int_kinds) = pt.build_scene_record(scene)
    cam = np.zeros(pt.CAMREC, np.float32)
    params = jnp.zeros(4, jnp.int32)
    out = jax.eval_shape(
        lambda r, d, b, sc, bc, m, c, p, im, at, ir: pt._trace_call(
            r, d, b, sc, bc, m, c, p, im, at, kinds, groups, n_dyn, n_box,
            n_sclus, n_bclus,
            med_kinds, flags, scene.background, nx, ny, grid, False,
            rr_depth, scene.perlin_seed,
            # dynamic-loop scenes trace the 2D pixel-block mapping, the
            # same choice render_pallas makes
            (128, pt.TILE // 128) if (n_dyn or n_box) else None,
            False, None, ir, int_kinds, attr_fields),
        jnp.asarray(rec), jnp.asarray(dyn), jnp.asarray(box),
        jnp.asarray(sclus), jnp.asarray(bclus), jnp.asarray(med),
        jnp.asarray(cam), params, jnp.asarray(img), jnp.asarray(attr),
        jnp.asarray(int_rec))
    assert out.shape == (3, grid * pt.SUB, pt.LANES)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize("name", KERNEL_PRESETS)
def test_kernel_traces(name):
    _trace(builders.PRESETS[name].build(), nx=256, ny=128, grid=4)


def test_kernel_traces_with_rr_and_multitile():
    # russian-roulette branch + >1 tile grid + non-multiple-of-TILE image
    _trace(builders.cornell_box(), nx=200, ny=200, grid=5, rr_depth=6)


def test_kernel_traces_multipixel_banks():
    """kpix > 1: per-lane pixel banks, bank-masked accumulators, and the
    (kpix·SUB)-row output block must trace (the balanced path's layout
    at production image sizes)."""
    scene = builders.PRESETS["final_scene"].build()
    (rec, kinds, groups, dyn, n_dyn, box, n_box, sclus, n_sclus, bclus,
     n_bclus, med, med_kinds, flags, img, attr, attr_fields, int_rec,
     int_kinds) = pt.build_scene_record(scene)
    cam = np.zeros(pt.CAMREC, np.float32)
    params = jnp.zeros(4, jnp.int32)
    grid, kpix = 3, 4
    pix = jnp.zeros((grid * kpix * pt.SUB, pt.LANES), jnp.int32)
    out = jax.eval_shape(
        lambda r, d, b, sc, bc, m, c, p, im, at, ir, px: pt._trace_call(
            r, d, b, sc, bc, m, c, p, im, at, kinds, groups, n_dyn, n_box,
            n_sclus, n_bclus, med_kinds, flags, scene.background,
            400, 400, grid, False, None, scene.perlin_seed, None,
            False, px, ir, int_kinds, attr_fields, kpix),
        jnp.asarray(rec), jnp.asarray(dyn), jnp.asarray(box),
        jnp.asarray(sclus), jnp.asarray(bclus), jnp.asarray(med),
        jnp.asarray(cam), params, jnp.asarray(img), jnp.asarray(attr),
        jnp.asarray(int_rec), pix)
    assert out.shape == (3, grid * kpix * pt.SUB, pt.LANES)
    assert out.dtype == jnp.float32


def test_kernel_traces_textured_dynamic_prims():
    """No preset puts checker/noise/image textures or movers in the
    DYNAMIC loop (their textured prims are unrolled heroes), so the
    compact attribute table's full-field path — A_T0/A_INVDT lerp,
    A_PARAM, and every extra band — only traces through this synthetic
    scene."""
    from raytracing_rust_tpu.models.scene import SceneBuilder, BG_SKY
    b = SceneBuilder(background=BG_SKY)
    rng = np.random.default_rng(3)
    checker = b.lambertian(b.checker(b.solid(0.2, 0.3, 0.1),
                                     b.solid(0.9, 0.9, 0.9)))
    noise = b.lambertian(b.noise(2.0))
    # the in-kernel atlas requires 8-bit-exact texels
    texels = np.rint(rng.uniform(26, 230, (8, 16, 3))).astype(np.float32)
    img = b.lambertian(b.image((texels / 255.0).astype(np.float32)))
    metal = b.metal(b.solid(0.8, 0.7, 0.6), 0.2)
    for i in range(120):   # > UNROLL_BUDGET, uniform radii (no heroes)
        mat = (checker, noise, img, metal)[i % 4]
        c = rng.uniform(-10, 10, 3)
        if i % 7 == 0:
            b.moving_sphere(c, c + np.array([0.2, 0, 0]), 0.0, 1.0,
                            0.5, mat)
        else:
            b.sphere(tuple(c), 0.5, mat)
    _trace(b.build(), nx=256, ny=128, grid=4)


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
                   interpret=False, rr_depth=None, perlin_seed=0,
                   block=None, stats=False, pix=None,
                   int_rec=None, int_kinds=(),
                   attr_fields=(), kpix=1):
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


def test_block_mapping_assembly_bijection():
    """The 2D pixel-block lane mapping (kernel) and the de-block assembly
    (host) must be exact inverses, including edge clamping, padding crop,
    and multi-device tile splits. The stub reproduces the kernel's
    mapping formula in numpy and emits each lane's pixel index; every
    image pixel must receive exactly its own index back."""
    scene = builders.random_spheres()   # n_dyn > 0 → block mapping
    cam = builders.PRESETS["random_spheres"].camera()
    nx, ny = 200, 90                    # non-multiples: clamp + crop
    n_pix = nx * ny
    real = pt._trace_call

    def fake_trace(rec, dyn, box, sclus, bclus, med, camr, params, img,
                   attr, kinds, groups, n_dyn, n_box, n_sclus, n_bclus,
                   med_kinds, flags, background, nx_, ny_, grid,
                   interpret=False, rr_depth=None, perlin_seed=0,
                   block=None, stats=False, pix=None,
                   int_rec=None, int_kinds=(),
                   attr_fields=(), kpix=1):
        assert block is not None
        bxw, byh = block
        assert bxw * byh == pt.TILE
        gx = -(-nx_ // bxw)
        g0 = int(params[3])
        lane = np.arange(pt.TILE).reshape(pt.SUB, pt.LANES)
        out = np.zeros((3, grid * pt.SUB, pt.LANES), np.float32)
        for t in range(grid):
            by_t, bx_t = divmod(g0 + t, gx)
            x = np.minimum(bx_t * bxw + lane % bxw, nx_ - 1)
            y = np.minimum(by_t * byh + lane // bxw, ny_ - 1)
            out[:, t * pt.SUB:(t + 1) * pt.SUB, :] = \
                (y * nx_ + x) / (4.0 * nx_ * ny_)
        return jnp.asarray(out)

    pt._trace_call = fake_trace
    try:
        img = pt.render_pallas(scene, cam, nx=nx, ny=ny, spp=1,
                               devices=jax.devices("cpu")[:2])
    finally:
        pt._trace_call = real
    expect = np.sqrt(np.arange(n_pix, dtype=np.float32)
                     / (4.0 * n_pix)).reshape(ny, nx)
    np.testing.assert_allclose(img[..., 0], expect, atol=1e-6)
    np.testing.assert_allclose(img[..., 2], expect, atol=1e-6)


def test_balanced_scheduling_assembly_bijection():
    """Cost-balanced mode: the probe's permutation, the per-lane pixel
    tables handed to each device, and the host scatter must compose to
    the identity — every pixel gets exactly its own samples back. The
    stub serves both the stats probe (row 6 = a deterministic per-lane
    cost pattern) and the balanced render (each lane returns its
    assigned pixel index)."""
    scene = builders.random_spheres()
    cam = builders.PRESETS["random_spheres"].camera()
    nx, ny = 200, 90
    n_pix = nx * ny
    real = pt._trace_call

    def fake_trace(rec, dyn, box, sclus, bclus, med, camr, params, img,
                   attr, kinds, groups, n_dyn, n_box, n_sclus, n_bclus,
                   med_kinds, flags, background, nx_, ny_, grid,
                   interpret=False, rr_depth=None, perlin_seed=0,
                   block=None, stats=False, pix=None,
                   int_rec=None, int_kinds=(),
                   attr_fields=(), kpix=1):
        if stats:
            out = np.zeros((7, grid * pt.SUB, pt.LANES), np.float32)
            # arbitrary deterministic cost pattern → some permutation
            out[6] = np.arange(grid * pt.SUB * pt.LANES) \
                .reshape(grid * pt.SUB, pt.LANES) % 97
            return jnp.asarray(out)
        assert pix is not None and block is None
        # multi-pixel banks: the out block mirrors the pix table's
        # (kpix·SUB) rows per tile, dummy slots included
        assert pix.shape == (grid * kpix * pt.SUB, pt.LANES)
        p = np.minimum(np.asarray(pix), n_pix - 1).astype(np.float32)
        # the real kernel banks the SUM over the chunk's spp samples
        out = np.broadcast_to(p / (4.0 * n_pix) * int(params[1]),
                              (3,) + p.shape)
        return jnp.asarray(out)

    pt._trace_call = fake_trace
    try:
        img = pt.render_pallas(scene, cam, nx=nx, ny=ny, spp=8,
                               devices=jax.devices("cpu")[:2],
                               balance=True)
    finally:
        pt._trace_call = real
    # 200×90 engages kpix = min(KPIX, n_pix // TILE) ≥ 2 when RT_KPIX
    # allows, covering the snake striping + interleaved-dummy scatter
    expect = np.sqrt(np.arange(n_pix, dtype=np.float32)
                     / (4.0 * n_pix)).reshape(ny, nx)
    np.testing.assert_allclose(img[..., 1], expect, atol=1e-6)


def test_kernel_traces_earth_compat_uv():
    """The sphere-UV compat quirk (SceneTables.compat_uv_bug) is a static
    kernel variant — it must trace like any other."""
    scene = builders.earth(compat_uv_bug=True)
    (rec, kinds, groups, dyn, n_dyn, box, n_box, sclus, n_sclus, bclus,
     n_bclus, med, med_kinds, flags, img, attr, attr_fields, int_rec,
     int_kinds) = pt.build_scene_record(scene)
    assert flags[-1]  # compat_uv reaches the kernel's static flags
    _trace(scene, nx=256, ny=128, grid=4)
