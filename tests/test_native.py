"""Native (C++) host runtime vs the Python implementations: the BVH
builder must be bit-identical, the PPM encoder byte-identical."""

import numpy as np
import pytest

from raytracing_rust_tpu import native
from raytracing_rust_tpu.accel.bvh import build_bvh
from raytracing_rust_tpu.models.scene import SceneBuilder
from raytracing_rust_tpu.utils import image_io

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")

RT = np.random.default_rng(23)


def _scene(n=97):
    b = SceneBuilder()
    m = b.lambertian(b.solid(1, 1, 1))
    for _ in range(n):
        b.sphere(RT.normal(0, 5, 3), 0.2 + RT.random(), m)
    b.cube((-1, -1, -1), (1, 1, 1), m)
    return b.build()


def test_native_bvh_matches_numpy():
    scene = _scene()
    a = build_bvh(scene, prefer_native=True)
    b = build_bvh(scene, prefer_native=False)
    np.testing.assert_array_equal(np.asarray(a.node_left),
                                  np.asarray(b.node_left))
    np.testing.assert_array_equal(np.asarray(a.node_count),
                                  np.asarray(b.node_count))
    np.testing.assert_array_equal(np.asarray(a.prim_order),
                                  np.asarray(b.prim_order))
    np.testing.assert_allclose(np.asarray(a.node_min),
                               np.asarray(b.node_min), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.node_max),
                               np.asarray(b.node_max), rtol=1e-6)


def test_native_ppm_matches_python():
    img = RT.random((7, 11, 3)).astype(np.float32)
    got = native.encode_ppm(img)
    ny, nx, _ = img.shape
    q = image_io.quantize(img).reshape(-1, 3)
    body = "\n".join(f"{r} {g} {b}" for r, g, b in q)
    want = f"P3\n{nx} {ny}\n255\n{body}\n"
    assert got == want


def test_to_ppm_uses_native_consistently():
    img = RT.random((5, 4, 3)).astype(np.float32)
    txt = image_io.to_ppm(img)
    back = np.array(txt.split()[4:], dtype=np.float32).reshape(5, 4, 3)
    np.testing.assert_allclose(back / 255.0, img, atol=1.0 / 255.0)
