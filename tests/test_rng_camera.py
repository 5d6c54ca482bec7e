"""Sampler distributions + camera ray parity.

The reference samplers are rejection loops over thread_rng (src/util.rs:4-24);
ours are closed-form with identical target distributions — verified here by
moment/radius statistics. Camera math is deterministic given injected lens
samples, so it checks exactly against the oracle (src/camera.rs:21-67).
"""

import numpy as np
import jax
import jax.numpy as jnp

import oracle
from raytracing_rust_tpu.ops import rng
from raytracing_rust_tpu.ops.camera import make_camera, get_rays

N = 200_000


def _u(shape, seed=0):
    return jax.random.uniform(jax.random.key(seed), shape)


def test_unit_sphere_distribution():
    s = np.asarray(rng.in_unit_sphere(_u((N, 3))))
    r = np.linalg.norm(s, axis=-1)
    assert r.max() <= 1.0 + 1e-5
    # uniform ball: E[r^3] uniform on [0,1]; mean component 0; E[r]=3/4
    np.testing.assert_allclose(np.mean(r ** 3), 0.5, atol=5e-3)
    np.testing.assert_allclose(np.mean(r), 0.75, atol=5e-3)
    np.testing.assert_allclose(s.mean(axis=0), 0.0, atol=5e-3)
    # isotropy: cov = r2/5 * I/3... check componentwise variance equality
    var = s.var(axis=0)
    np.testing.assert_allclose(var, var.mean(), rtol=2e-2)


def test_unit_sphere_never_zero():
    """Regression: u[...,2]=0 (one uniform draw in 2^24) must NOT produce
    the exact zero vector — an isotropic scatter with a zero direction
    misses every primitive and the sky background's normalize turns the
    miss into a NaN pixel (observed once per ~10M paths on hardware).
    The radius draws from 1-u, uniform on (0,1]."""
    corners = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                           [1.0 - 2 ** -24, 0.25, 0.0],
                           [0.0, 0.0, 1.0 - 2 ** -24]], jnp.float32)
    s = np.asarray(rng.in_unit_sphere(corners))
    assert np.isfinite(s).all()
    assert (np.linalg.norm(s, axis=-1) > 1e-4).all()


def test_unit_disk_distribution():
    s = np.asarray(rng.in_unit_disk(_u((N, 2), seed=1)))
    assert np.all(s[:, 2] == 0.0)
    r = np.linalg.norm(s[:, :2], axis=-1)
    assert r.max() <= 1.0 + 1e-5
    np.testing.assert_allclose(np.mean(r ** 2), 0.5, atol=5e-3)
    np.testing.assert_allclose(s[:, :2].mean(axis=0), 0.0, atol=5e-3)


def test_lane_uniforms_follow_lane_identity():
    """The wavefront-compaction RNG contract: a lane's draws depend only
    on its id, never on batch width or position — gathering a subset of
    lanes yields exactly the corresponding rows of the full batch."""
    key = jax.random.key(11)
    lanes = jnp.arange(64, dtype=jnp.int32)
    full = np.asarray(rng.lane_uniforms(key, 5, lanes, 4))
    idx = jnp.asarray([3, 17, 42, 63, 0], jnp.int32)
    sub = np.asarray(rng.lane_uniforms(key, 5, lanes[idx], 4))
    np.testing.assert_array_equal(sub, full[np.asarray(idx)])
    # deterministic per args; distinct bounces/keys decorrelate; [0,1)
    again = np.asarray(rng.lane_uniforms(key, 5, lanes, 4))
    np.testing.assert_array_equal(full, again)
    other = np.asarray(rng.lane_uniforms(key, 6, lanes, 4))
    assert not np.allclose(full, other)
    assert not np.allclose(full, np.asarray(
        rng.lane_uniforms(jax.random.key(12), 5, lanes, 4)))
    assert full.min() >= 0.0 and full.max() < 1.0


def test_camera_rays_vs_oracle():
    """Pinhole comparison (aperture=0 ⇒ no lens randomness; t fixed)."""
    args = dict(look_from=(13, 2, 3), look_at=(0, 0, 0), view_up=(0, 1, 0),
                vertical_fov=20.0, aspect=16 / 9, aperture=0.0,
                focus_dist=10.0)
    cam = make_camera(**args)
    s = np.array([0.0, 0.25, 0.5, 1.0])
    t = np.array([0.0, 1.0, 0.5, 0.25])
    u = np.zeros((4, 3))
    o, d, time = get_rays(cam, jnp.asarray(s, jnp.float32),
                          jnp.asarray(t, jnp.float32),
                          jnp.asarray(u, jnp.float32))
    o, d = np.asarray(o), np.asarray(d)
    for i in range(4):
        oo, dd = oracle.camera_ray((13, 2, 3), (0, 0, 0), (0, 1, 0), 20.0,
                                   16 / 9, 0.0, 10.0, s[i], t[i])
        np.testing.assert_allclose(o[i], oo, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(d[i], dd, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(time), 0.0)


def test_camera_lens_offset_and_time():
    """Aperture shifts origin on the lens disk in the (u,v) basis; direction
    re-targets the same focal point (src/camera.rs:53-67)."""
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, 1.0,
                      aperture=2.0, focus_dist=1.0, time0=2.0, time1=6.0)
    u = jnp.asarray([[0.81, 0.0, 0.25]], jnp.float32)  # disk r=0.9, phi=0
    o, d, time = get_rays(cam, jnp.asarray([0.5]), jnp.asarray([0.5]), u)
    np.testing.assert_allclose(np.asarray(o)[0], [0.9, 0.0, 0.0], atol=1e-6)
    # center ray through focus point (0,0,-1): direction = focus - origin
    np.testing.assert_allclose(np.asarray(d)[0], [-0.9, 0.0, -1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(time)[0], 3.0, rtol=1e-6)
