"""Material shading parity vs the scalar oracle (reference src/material.rs)."""

import numpy as np
import jax
import jax.numpy as jnp

import oracle
from raytracing_rust_tpu.models.scene import SceneBuilder
from raytracing_rust_tpu.ops import materials

RT = np.random.default_rng(3)


def _unitish(n):
    v = RT.normal(0, 1, (n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_reflect_vs_oracle():
    v = RT.normal(0, 2, (32, 3))
    n = _unitish(32)
    got = np.asarray(materials._reflect(jnp.asarray(v), jnp.asarray(n)))
    for i in range(32):
        np.testing.assert_allclose(got[i], oracle.reflect(v[i], n[i]),
                                   rtol=1e-5, atol=1e-6)


def test_refract_vs_oracle():
    v = RT.normal(0, 2, (64, 3))
    n = _unitish(64)
    # make n oppose v like a real outward normal
    flip = np.sign(np.sum(v * n, -1, keepdims=True))
    n = -n * np.where(flip == 0, 1.0, flip)
    eta = np.full(64, 1.0 / 1.5)
    got, ok = materials._refract(jnp.asarray(v), jnp.asarray(n),
                                 jnp.asarray(eta))
    got, ok = np.asarray(got), np.asarray(ok)
    for i in range(64):
        want = oracle.refract(v[i], n[i], eta[i])
        if want is None:
            assert not ok[i]
        else:
            assert ok[i]
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_schlick_vs_oracle():
    cos = RT.random(16)
    got = np.asarray(materials._schlick(jnp.asarray(cos), 1.5))
    want = [oracle.schlick(c, 1.5) for c in cos]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _scatter(scene, mat_id, d_in, normal, u_sphere=None, u_branch=None,
             p=None):
    n = d_in.shape[0]
    u_sphere = np.full((n, 3), 0.5) if u_sphere is None else u_sphere
    u_branch = np.full(n, 0.5) if u_branch is None else u_branch
    p = np.zeros((n, 3)) if p is None else p
    out = materials.scatter(
        scene, jnp.asarray(d_in, jnp.float32), jnp.asarray(p, jnp.float32),
        jnp.asarray(normal, jnp.float32), jnp.zeros(n), jnp.zeros(n),
        jnp.asarray(mat_id, jnp.int32), jnp.asarray(u_sphere, jnp.float32),
        jnp.asarray(u_branch, jnp.float32))
    return tuple(np.asarray(x) for x in out)


def _simple_scene():
    b = SceneBuilder()
    lam = b.lambertian(b.solid(0.3, 0.5, 0.7))         # mat 0
    met = b.metal(b.solid(0.9, 0.8, 0.7), 0.0)         # mat 1
    diel = b.dielectric(1.5)                           # mat 2
    light = b.diffuse_light(b.solid(4, 4, 4))          # mat 3
    iso = b.isotropic(b.solid(1, 1, 1))                # mat 4
    b.sphere((0, 0, 0), 1.0, lam)
    return b.build(), (lam, met, diel, light, iso)


def test_lambertian_scatter():
    """dir = normal + ball_sample; attenuation = albedo (src/material.rs:49-53)."""
    scene, (lam, *_) = _simple_scene()
    n = 16
    normal = _unitish(n)
    d_in = RT.normal(0, 1, (n, 3))
    u_sphere = RT.random((n, 3))
    new_d, att, ok = _scatter(scene, np.full(n, lam), d_in, normal, u_sphere)
    from raytracing_rust_tpu.ops.rng import in_unit_sphere
    samp = np.asarray(in_unit_sphere(jnp.asarray(u_sphere, jnp.float32)))
    np.testing.assert_allclose(new_d, normal + samp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(att, np.tile([0.3, 0.5, 0.7], (n, 1)),
                               rtol=1e-5)
    assert ok.all()


def test_metal_scatter_and_absorb():
    """Mirror reflect of the unit direction; absorbed when leaving hemisphere
    below the surface (src/material.rs:76-87)."""
    scene, (_, met, *_) = _simple_scene()
    normal = np.tile([0.0, 1.0, 0.0], (2, 1))
    d_in = np.array([[1.0, -1.0, 0.0],    # grazing down -> reflects up
                     [1.0, -0.001, 0.0]])  # nearly parallel -> still ok
    # ball sample at u=0.5 has radius cbrt(0.5)≈0.79 but fuzz=0 ignores it
    new_d, att, ok = _scatter(scene, np.full(2, met), d_in, normal)
    for i in range(2):
        want = oracle.reflect(d_in[i] / np.linalg.norm(d_in[i]), normal[i])
        np.testing.assert_allclose(new_d[i], want, rtol=1e-4, atol=1e-6)
    assert ok.all()
    # a fuzzy metal kicking the reflection below the horizon absorbs
    b = SceneBuilder()
    fuzzy = b.metal(b.solid(1, 1, 1), 1.0)
    b.sphere((0, 0, 0), 1.0, fuzzy)
    scene2 = b.build()
    # fuzz sample ≈ (0,-1,0): cos_t=0 (u0=.5), phi=3π/2 (u1=.75), and
    # r = cbrt(1-u2) ≈ 1 needs u2 ≈ 0 (the radius draws from 1-u so
    # u=0 cannot produce the exact zero vector — see ops/rng.py)
    u_down = np.array([[0.5, 0.75, 0.001]])
    new_d, att, ok = _scatter(scene2, np.array([0]),
                              np.array([[1.0, -0.05, 0.0]]),
                              np.array([[0.0, 1.0, 0.0]]), u_down)
    assert not ok[0]


def test_dielectric_branches():
    """Refract when u >= schlick prob, reflect otherwise; total internal
    reflection always reflects (src/material.rs:105-126)."""
    scene, (_, _, diel, *_) = _simple_scene()
    normal = np.tile([0.0, 1.0, 0.0], (3, 1))
    d_in = np.array([
        [0.3, -1.0, 0.0],   # entering
        [0.3, 1.0, 0.0],    # exiting, moderate angle
        [1.0, 0.02, 0.0],   # exiting, grazing -> TIR
    ])
    # u_branch=1.0 forces refraction whenever possible
    new_d, att, ok = _scatter(scene, np.full(3, diel), d_in, normal,
                              u_branch=np.full(3, 0.999999))
    for i in range(3):
        out_n, eta, cosine = oracle.dielectric_setup(d_in[i], normal[i], 1.5)
        want = oracle.refract(d_in[i], out_n, eta)
        if want is None:
            want = oracle.reflect(d_in[i], normal[i])
        np.testing.assert_allclose(new_d[i], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(att, 1.0)
    assert ok.all()
    # u_branch=0 forces reflection (schlick prob > 0 always)
    new_d, _, _ = _scatter(scene, np.full(3, diel), d_in, normal,
                           u_branch=np.zeros(3))
    for i in range(3):
        want = oracle.reflect(d_in[i], normal[i])
        np.testing.assert_allclose(new_d[i], want, rtol=1e-4, atol=1e-5)


def test_diffuse_light_emits_and_kills():
    scene, (_, _, _, light, _) = _simple_scene()
    n = 4
    e = np.asarray(materials.emitted(
        scene, jnp.full(n, light, jnp.int32), jnp.zeros(n), jnp.zeros(n),
        jnp.zeros((n, 3))))
    np.testing.assert_allclose(e, 4.0)
    _, _, ok = _scatter(scene, np.full(n, light), RT.normal(0, 1, (n, 3)),
                        _unitish(n))
    assert not ok.any()
    # non-emitters emit zero
    e0 = np.asarray(materials.emitted(
        scene, jnp.zeros(n, jnp.int32), jnp.zeros(n), jnp.zeros(n),
        jnp.zeros((n, 3))))
    np.testing.assert_allclose(e0, 0.0)


def test_isotropic_scatter_is_ball_sample():
    scene, (*_, iso) = _simple_scene()
    n = 8
    u_sphere = RT.random((n, 3))
    new_d, att, ok = _scatter(scene, np.full(n, iso),
                              RT.normal(0, 1, (n, 3)), _unitish(n), u_sphere)
    from raytracing_rust_tpu.ops.rng import in_unit_sphere
    samp = np.asarray(in_unit_sphere(jnp.asarray(u_sphere, jnp.float32)))
    np.testing.assert_allclose(new_d, samp, rtol=1e-5, atol=1e-6)
    assert ok.all()
