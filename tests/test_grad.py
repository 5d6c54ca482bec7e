"""Differentiability: autodiff pixel gradients vs finite differences
(BASELINE.md target "pixel-grad max abs err vs FD").

The estimator is smooth in continuous scene parameters at FIXED RNG draws
(discrete decisions — hit selection, dielectric branch, medium event — are
detached), so central differences at the same seed converge to the autodiff
gradient up to f32 roundoff.
"""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_rust_tpu.models.scene import SceneBuilder, BG_BLACK, BG_SKY
from raytracing_rust_tpu.models import builders
from raytracing_rust_tpu.ops.integrator import trace

KEY = jax.random.key(2)


def _cornellish():
    b = SceneBuilder(background=BG_BLACK)
    red = b.lambertian(b.solid(0.65, 0.05, 0.05))
    white = b.lambertian(b.solid(0.73, 0.73, 0.73))
    b.rect("zx", -2, -2, 2, 2, 0.0, white)          # floor
    b.rect("yz", 0, -2, 4, 2, -2.0, red)            # left wall
    b.rect("zx", -1, -1, 1, 1, 4.0, b.diffuse_light(b.solid(5, 5, 5)),
           flip=True)                                # ceiling light
    b.sphere((0.5, 1.0, 0.5), 0.6, b.metal(b.solid(0.8, 0.8, 0.8), 0.3))
    b.sphere((-0.7, 0.7, -0.3), 0.5, b.dielectric(1.5))
    return b.build()


def _rays(n=64):
    rng = np.random.default_rng(9)
    o = np.tile([0.0, 1.5, 6.0], (n, 1)).astype(np.float32)
    d = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.4, 0.2, n),
                  -np.ones(n)], -1).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def _loss_fn(scene, o, d):
    rad = trace(scene, o, d, jnp.zeros(o.shape[0]), KEY, max_depth=4,
                differentiable=True)
    return jnp.mean(rad)


def _fd_check(scene, leaf_path, idx, eps, rtol, atol):
    o, d = _rays()
    loss, grads = jax.value_and_grad(_loss_fn, allow_int=True)(scene, o, d)
    assert np.isfinite(loss)
    g_auto = np.asarray(getattr(grads, leaf_path))[idx]

    arr = np.asarray(getattr(scene, leaf_path), np.float32)

    def loss_at(v):
        a = arr.copy()
        a[idx] = v
        s2 = type(scene)(**{**scene.__dict__, leaf_path: jnp.asarray(a)})
        return float(_loss_fn(s2, o, d))

    v0 = arr[idx]
    g_fd = (loss_at(v0 + eps) - loss_at(v0 - eps)) / (2 * eps)
    np.testing.assert_allclose(g_auto, g_fd, rtol=rtol, atol=atol)
    return g_auto


def test_grad_albedo_vs_fd():
    """d loss / d (white wall albedo red channel)."""
    scene = _cornellish()
    g = _fd_check(scene, "tex_color", (1, 0), eps=1e-2, rtol=5e-2, atol=1e-4)
    assert g > 0  # brighter wall ⇒ brighter image


def test_grad_emission_vs_fd():
    """d loss / d (light emission) — radiance is linear in emission."""
    scene = _cornellish()
    g = _fd_check(scene, "tex_color", (2, 1), eps=5e-2, rtol=2e-2, atol=1e-4)
    assert g > 0


def test_grad_metal_fuzz_vs_fd():
    """d loss / d fuzz — continuous through the perturbed reflection."""
    scene = _cornellish()
    _fd_check(scene, "mat_param", (3,), eps=2e-2, rtol=0.1, atol=2e-3)


def test_grad_geometry_vs_fd():
    """d loss / d (sphere radius) — geometry gradients flow through the
    quadratic solve and normals (fixed discrete hit selection)."""
    scene = _cornellish()
    # prim 3 = metal sphere; data[3] = radius
    _fd_check(scene, "prim_data", (3, 3), eps=2e-3, rtol=0.15, atol=2e-3)


def test_full_scene_grads_finite():
    """No NaN/Inf cotangents anywhere in the cornell_box scene tables
    (guards the sqrt/maximum double-where fixes in intersect/materials)."""
    scene = builders.cornell_box()
    o, d = _rays(32)
    _, grads = jax.value_and_grad(_loss_fn, allow_int=True)(scene, o, d)
    for leaf in jax.tree_util.tree_leaves(grads):
        if np.issubdtype(leaf.dtype, np.floating):
            assert np.all(np.isfinite(np.asarray(leaf)))


def test_grad_sky_scene_finite():
    scene = builders.two_spheres()
    o, d = _rays(32)
    loss, grads = jax.value_and_grad(_loss_fn, allow_int=True)(scene, o, d)
    assert np.isfinite(loss)
    g = np.asarray(grads.tex_color)
    assert np.all(np.isfinite(g)) and np.any(g != 0)


def test_grad_noise_scene_escaping_rays_finite():
    """Regression (round-3 review): miss lanes carry t=BIG, and BIG*d
    overflows to inf for unnormalized camera-scale directions (|d|~10);
    the marble texture's sin(inf) then NaN'd the WHOLE gradient pytree
    through the un-guarded p = o + t*d (0-cotangent * NaN = NaN). Also
    covers the dielectric 1/ref_idx guard for non-dielectric rows: before
    it, one mat_param row went NaN even with no dielectric in the scene."""
    b = SceneBuilder(background=BG_SKY)
    b.sphere((0, -100, 0), 99.0, b.lambertian(b.noise(3.0)))
    b.sphere((1.5, 1.0, -1.0), 0.8, b.metal(b.solid(0.8, 0.8, 0.8), 0.2))
    scene = b.build()
    n = 8
    o = jnp.tile(jnp.asarray([[0.0, 1.0, 5.0]]), (n, 1))
    # |d| ~ 10 like real camera rays; half escape upward (sky misses —
    # the NaN trigger), half hit the noise ground (live tex_scale grad)
    d = jnp.asarray(np.stack([np.linspace(-3, 3, n),
                              np.linspace(5.0, -2.0, n),
                              np.full(n, -8.0)], -1), jnp.float32)
    loss, grads = jax.value_and_grad(
        lambda s: jnp.mean(trace(s, o, d, jnp.zeros(n), KEY, max_depth=4,
                                 differentiable=True)),
        allow_int=True)(scene)
    assert np.isfinite(float(loss))
    for name, leaf in grads.__dict__.items():
        a = np.asarray(leaf)
        if a.dtype.kind == "f":
            assert np.isfinite(a).all(), f"NaN/inf gradient in {name}"
    # and the noise-scale gradient is live, not just finite
    assert np.any(np.asarray(grads.tex_scale) != 0)


def test_grad_noise_scale_vs_fd():
    """d loss / d (noise frequency): flows through floor/Hermite/hash
    lattice — compilable only since the perlin corner-vectorization +
    octave-scan rewrite."""
    b = SceneBuilder(background=BG_SKY)
    b.sphere((0, -100, 0), 99.0, b.lambertian(b.noise(3.0)))
    scene = b.build()
    tex = int(np.argmax(np.asarray(scene.tex_scale)))
    _fd_check(scene, "tex_scale", (tex,), eps=1e-3, rtol=0.1, atol=2e-3)
