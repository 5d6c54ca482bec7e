"""Intersection parity vs the scalar oracle (reference src/sphere.rs,
src/rect.rs, src/rotate.rs, src/traslate.rs semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from raytracing_rust_tpu.models.scene import SceneBuilder
from raytracing_rust_tpu.ops.intersect import closest_hit, hit_attributes

RT = np.random.default_rng(42)


def _rays(n=64, spread=3.0):
    o = RT.normal(0, spread, (n, 3))
    d = RT.normal(0, 1, (n, 3))
    d[np.abs(d) < 1e-3] += 0.1  # avoid near-axis-parallel edge cases
    return o, d


from functools import partial
import jax


@partial(jax.jit, static_argnames=("chunk",))
def _closest_jit(scene, o, d, time, chunk):
    hit = closest_hit(scene, o, d, time, 1e-3, chunk=chunk)
    p, nrm, u, v, mat = hit_attributes(scene, o, d, time, hit)
    return hit.t, hit.idx, hit.mask, p, nrm, u, v


def _closest(scene, o, d, time=None, chunk=4):
    n = o.shape[0]
    time = np.zeros(n) if time is None else time
    out = _closest_jit(scene, jnp.asarray(o, jnp.float32),
                       jnp.asarray(d, jnp.float32),
                       jnp.asarray(time, jnp.float32), chunk)
    return tuple(np.asarray(x) for x in out)


def test_sphere_vs_oracle():
    b = SceneBuilder()
    m = b.lambertian(b.solid(1, 1, 1))
    spheres = [((0, 0, 0), 1.0), ((2, 1, -1), 0.5), ((-3, 0, 2), 2.0)]
    for c, r in spheres:
        b.sphere(c, r, m)
    scene = b.build()
    o, d = _rays(128)
    t, idx, mask, p, nrm, u, v = _closest(scene, o, d)
    for i in range(o.shape[0]):
        best = None
        for k, (c, r) in enumerate(spheres):
            h = oracle.sphere_hit(c, r, o[i], d[i], 1e-3, 3e38)
            if h and (best is None or h[0] < best[1][0]):
                best = (k, h)
        if best is None:
            assert not mask[i]
        else:
            k, (te, pe, ne, ue, ve) = best
            assert mask[i] and idx[i] == k
            np.testing.assert_allclose(t[i], te, rtol=2e-4)
            np.testing.assert_allclose(nrm[i], ne, atol=2e-3)
            np.testing.assert_allclose([u[i], v[i]], [ue, ve], atol=2e-3)


def test_moving_sphere_vs_oracle():
    b = SceneBuilder()
    m = b.lambertian(b.solid(1, 1, 1))
    b.moving_sphere((0, 0, 0), (0, 0.5, 0), 0.0, 1.0, 0.7, m)
    scene = b.build()
    o, d = _rays(64)
    time = RT.random(64)
    t, idx, mask, p, nrm, u, v = _closest(scene, o, d, time)
    for i in range(64):
        h = oracle.sphere_hit((0, 0, 0), 0.7, o[i], d[i], 1e-3, 3e38,
                              time=time[i], c1=(0, 0.5, 0))
        if h is None:
            assert not mask[i]
        else:
            assert mask[i]
            np.testing.assert_allclose(t[i], h[0], rtol=3e-4)


@pytest.mark.parametrize("plane", ["yz", "zx", "xy"])
def test_rect_vs_oracle(plane):
    b = SceneBuilder()
    m = b.lambertian(b.solid(1, 1, 1))
    b.rect(plane, -1.0, -0.5, 2.0, 1.5, 0.8, m)
    scene = b.build()
    o, d = _rays(128, spread=2.0)
    t, idx, mask, p, nrm, u, v = _closest(scene, o, d)
    for i in range(128):
        h = oracle.rect_hit(plane, -1.0, -0.5, 2.0, 1.5, 0.8, o[i], d[i],
                            1e-3, 3e38)
        if h is None:
            assert not mask[i], f"ray {i} spurious hit"
        else:
            te, pe, ne, ue, ve = h
            assert mask[i], f"ray {i} missed"
            np.testing.assert_allclose(t[i], te, rtol=2e-4)
            np.testing.assert_allclose(nrm[i], ne, atol=1e-5)
            np.testing.assert_allclose([u[i], v[i]], [ue, ve], atol=2e-3)


def test_flip_normals():
    b = SceneBuilder()
    m = b.lambertian(b.solid(1, 1, 1))
    b.rect("xy", -1, -1, 1, 1, 0.0, m, flip=True)
    scene = b.build()
    o = np.array([[0.0, 0.0, -2.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    _, _, mask, _, nrm, _, _ = _closest(scene, o, d)
    assert mask[0] and np.allclose(nrm[0], [0, 0, -1])


def test_translate_rotate_vs_oracle():
    """Traslate(Rotate(rect)) exactly like cornell's boxes
    (reference tests/test.rs:297-321)."""
    b = SceneBuilder()
    m = b.lambertian(b.solid(1, 1, 1))
    xf = b.transform(offset=(1.0, 2.0, -0.5), rotate_axis="y", angle_deg=-18.0)
    b.rect("xy", 0.0, 0.0, 2.0, 2.0, 1.0, m, xform=xf)
    scene = b.build()
    o, _ = _rays(256, spread=4.0)
    # aim at points near the (transformed) rect so most rays hit non-grazing
    targets = RT.uniform(-0.5, 2.5, (256, 3)) + np.array([1.0, 2.0, 0.5])
    d = targets - o
    t, idx, mask, p, nrm, u, v = _closest(scene, o, d)

    import math
    s, c = math.sin(math.radians(-18.0)), math.cos(math.radians(-18.0))
    off = np.array([1.0, 2.0, -0.5])
    hits = 0
    for i in range(256):
        oo, dd = oracle.rotate_ray_in("y", s, c, o[i] - off, d[i])
        h = oracle.rect_hit("xy", 0.0, 0.0, 2.0, 2.0, 1.0, oo, dd, 1e-3, 3e38)
        # skip grazing incidences — f32 t error is amplified by 1/|d_k|
        if abs(dd[2]) < 0.2 * np.linalg.norm(dd):
            continue
        if h is None:
            assert not mask[i]
        else:
            hits += 1
            te, pe, ne, ue, ve = h
            pw = oracle.rotate_point_out("y", s, c, pe) + off
            nw = oracle.rotate_point_out("y", s, c, ne)
            assert mask[i]
            np.testing.assert_allclose(t[i], te, rtol=3e-4)
            np.testing.assert_allclose(p[i], pw, atol=2e-3)
            np.testing.assert_allclose(nrm[i], nw, atol=1e-4)
    assert hits > 5, "test rays should hit the rotated rect sometimes"


def test_cube_is_six_rects():
    b = SceneBuilder()
    m = b.lambertian(b.solid(1, 1, 1))
    b.cube((0, 0, 0), (1, 2, 3), m)
    scene = b.build()
    assert scene.num_prims == 6
    # axis-aligned rays hit the right faces at the right t
    cases = [
        ([-5, 1, 1.5], [1, 0, 0], 5.0, [1, 0, 0]),   # yz at x=0 (normal +x)
        ([5, 1, 1.5], [-1, 0, 0], 4.0, [1, 0, 0]),   # yz at x=1
        ([0.5, -5, 1.5], [0, 1, 0], 5.0, [0, 1, 0]),
        ([0.5, 1, 9], [0, 0, -1], 6.0, [0, 0, 1]),
    ]
    o = np.array([c[0] for c in cases], float)
    d = np.array([c[1] for c in cases], float)
    t, idx, mask, p, nrm, u, v = _closest(scene, o, d)
    for i, (_, _, te, ne) in enumerate(cases):
        assert mask[i]
        np.testing.assert_allclose(t[i], te, rtol=1e-5)
        np.testing.assert_allclose(nrm[i], ne, atol=1e-6)


def test_chunking_invariance():
    """closest_hit must not depend on the scan chunk size."""
    b = SceneBuilder()
    m = b.lambertian(b.solid(1, 1, 1))
    rng = np.random.default_rng(7)
    for _ in range(37):  # deliberately not a multiple of any chunk size
        b.sphere(rng.normal(0, 3, 3), 0.3 + rng.random(), m)
    scene = b.build()
    o, d = _rays(64)
    r1 = _closest(scene, o, d, chunk=8)
    r2 = _closest(scene, o, d, chunk=64)
    np.testing.assert_array_equal(r1[1], r2[1])
    np.testing.assert_allclose(r1[0], r2[0], rtol=1e-6)


def test_negative_radius_hollow_sphere():
    """Negative radius flips the normal via (p−c)/r — the book's hollow
    glass trick (reference src/sphere.rs:46-52 sign convention)."""
    b = SceneBuilder()
    m = b.dielectric(1.5)
    b.sphere((0, 0, 0), -0.5, m)
    scene = b.build()
    o = np.array([[0.0, 0.0, -2.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    t, idx, mask, p, nrm, u, v = _closest(scene, o, d)
    assert mask[0]
    np.testing.assert_allclose(t[0], 1.5, rtol=1e-5)   # |r| sphere surface
    # outward point, but normal points INWARD because r < 0
    np.testing.assert_allclose(nrm[0], [0, 0, 1], atol=1e-5)


def test_sphere_uv_compat_bug_flag():
    """compat_uv_bug=True reproduces the reference's FRAC_2_PI sphere-UV
    constant (src/sphere.rs:13); default uses the canonical π/2. Both are
    pinned against the scalar oracle (oracle.sphere_uv)."""
    o, _ = _rays(32)
    c = np.array([0.3, -0.2, 0.1])
    d = c - o + RT.normal(0, 0.15, o.shape)  # aim at the sphere, jittered
    for compat in (False, True):
        b = SceneBuilder(compat_uv_bug=compat)
        b.sphere((0.3, -0.2, 0.1), 1.2, b.lambertian(b.solid(1, 1, 1)))
        scene = b.build()
        t, idx, mask, p, nrm, u, v = _closest(scene, o, d)
        checked = 0
        for i in range(len(o)):
            if not mask[i]:
                continue
            ref = oracle.sphere_hit((0.3, -0.2, 0.1), 1.2, o[i], d[i],
                                    1e-3, np.inf)
            assert ref is not None
            _, _, n_ref, _, _ = ref
            u_ref, v_ref = oracle.sphere_uv(n_ref, compat_bug=compat)
            np.testing.assert_allclose(u[i], u_ref, atol=2e-5)
            np.testing.assert_allclose(v[i], v_ref, atol=2e-5)
            checked += 1
        assert checked >= 8
