"""ConstantMedium sampling (reference src/medium.rs:28-56)."""

import numpy as np
import jax.numpy as jnp

from raytracing_rust_tpu.models.scene import SceneBuilder
from raytracing_rust_tpu.ops.intersect import BIG, media_scatter

RT = np.random.default_rng(5)


def _box_scene(density=2.0, xform=None):
    b = SceneBuilder()
    kw = {}
    if xform is not None:
        kw["xform"] = b.transform(**xform)
    b.medium_box((0, 0, 0), (1, 1, 1), density, b.solid(1, 1, 1), **kw)
    return b.build()


def _scatter(scene, o, d, u, t_surface=None):
    n = o.shape[0]
    t_surface = np.full(n, BIG) if t_surface is None else t_surface
    t, mat = media_scatter(scene, jnp.asarray(o, jnp.float32),
                           jnp.asarray(d, jnp.float32),
                           1e-3, jnp.asarray(t_surface, jnp.float32),
                           jnp.asarray(u, jnp.float32).reshape(n, -1))
    return np.asarray(t), np.asarray(mat)


def test_box_medium_free_flight():
    """Ray through the unit box: scatter at enter + (-1/rho)ln(u) exactly
    (src/medium.rs:40-44), no event when the flight overshoots the exit."""
    rho = 2.0
    scene = _box_scene(rho)
    o = np.tile([-1.0, 0.5, 0.5], (4, 1))
    d = np.tile([1.0, 0.0, 0.0], (4, 1))
    u = np.array([0.9, 0.5, 0.2, 0.05])
    flight = -(1.0 / rho) * np.log(u)
    t, _ = _scatter(scene, o, d, u)
    for i in range(4):
        if flight[i] < 1.0:  # dist inside the unit box
            np.testing.assert_allclose(t[i], 1.0 + flight[i], rtol=1e-5)
        else:
            assert t[i] >= BIG


def test_medium_respects_surface_clamp():
    """Exit clamps to the closest surface hit (src/medium.rs:32-37)."""
    rho = 4.0
    scene = _box_scene(rho)
    o = np.array([[-1.0, 0.5, 0.5]])
    d = np.array([[1.0, 0.0, 0.0]])
    u = np.array([0.2])  # flight = ln(5)/4 ≈ 0.40 < 1
    # surface at t=1.2 cuts the medium span to 0.2 < flight -> no scatter
    t, _ = _scatter(scene, o, d, u, t_surface=np.array([1.2]))
    assert t[0] >= BIG
    # surface beyond the span leaves the event intact
    t, _ = _scatter(scene, o, d, u, t_surface=np.array([3.0]))
    np.testing.assert_allclose(t[0], 1.0 + 0.25 * np.log(5.0), rtol=1e-5)


def test_ray_starting_inside():
    """Entry clamps to t_min for rays born inside the volume."""
    rho = 100.0
    scene = _box_scene(rho)
    o = np.array([[0.5, 0.5, 0.5]])
    d = np.array([[1.0, 0.0, 0.0]])
    u = np.array([0.5])
    t, _ = _scatter(scene, o, d, u)
    np.testing.assert_allclose(t[0], 1e-3 + np.log(2.0) / rho, rtol=1e-3)


def test_scatter_probability_matches_beer_lambert():
    """P(scatter over length L) = 1 - exp(-rho L)."""
    rho = 1.5
    scene = _box_scene(rho)
    n = 20_000
    o = np.tile([-1.0, 0.5, 0.5], (n, 1))
    d = np.tile([1.0, 0.0, 0.0], (n, 1))
    u = RT.random(n)
    t, _ = _scatter(scene, o, d, u)
    p_hit = np.mean(t < BIG)
    np.testing.assert_allclose(p_hit, 1.0 - np.exp(-rho * 1.0), atol=0.01)


def test_sphere_medium_and_unnormalized_dirs():
    """Sphere boundary + |d| != 1: hit_dist is measured in world distance,
    t in ray parameter (src/medium.rs:39-44)."""
    rho = 3.0
    b = SceneBuilder()
    b.medium_sphere((0, 0, 0), 1.0, rho, b.solid(1, 1, 1))
    scene = b.build()
    o = np.array([[-3.0, 0.0, 0.0]])
    d = np.array([[2.0, 0.0, 0.0]])   # |d| = 2, enters at t=1, exits t=2
    u = np.array([0.4])
    flight = -(1.0 / rho) * np.log(0.4)   # world-space distance
    t, _ = _scatter(scene, o, d, u)
    if flight < 2.0:  # inside span of world length 2
        np.testing.assert_allclose(t[0], 1.0 + flight / 2.0, rtol=1e-5)
    else:
        assert t[0] >= BIG


def test_transformed_medium_boundary():
    """Rotated+translated box boundary (cornell_smoke boxes,
    tests/test.rs:379-415)."""
    scene = _box_scene(1e9, xform=dict(offset=(5.0, 0.0, 0.0),
                                       rotate_axis="y", angle_deg=45.0))
    # huge density => scatters immediately at entry if the boundary is hit
    o = np.array([[5.0 + 0.5, 0.5, 5.0],   # above the rotated box, aiming -z
                  [0.0, 0.5, 0.0]])        # far from it
    d = np.array([[0.0, 0.0, -1.0],
                  [0.0, 0.0, -1.0]])
    t, _ = _scatter(scene, o, d, np.array([0.5, 0.5]))
    assert t[0] < BIG          # passes through the rotated box
    assert t[1] >= BIG         # misses entirely
