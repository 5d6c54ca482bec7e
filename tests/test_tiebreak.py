"""Coincident-primitive tie-break parity (reference scan-order semantics).

The reference resolves equal-t ties by HittableList scan order
(src/hittable.rs:37-47) and the outcome depends on the primitive:
Rect::hit rejects with `t > t_max` (src/rect.rs:45-47), so a later
coincident rect REPLACES the hit; Sphere::hit accepts with `t < t_max`
(src/sphere.rs:47), strict, so the FIRST coincident sphere wins.
cornell_box exercises this for real: its floor is pushed twice — flipped
then unflipped (tests/test.rs:268-295) — and the reference renders the
unflipped (+y) copy. Our closest-hit is an order-free min-reduction, so
SceneBuilder deletes shadowed duplicates at build time
(models/scene.py _dedup_coincident); these tests pin that behavior.
"""

import numpy as np

from raytracing_rust_tpu.models.builders import cornell_box
from raytracing_rust_tpu.models.scene import PRIM_RECT, SceneBuilder


def test_cornell_floor_unflipped_survives():
    scene = cornell_box()
    axis = np.asarray(scene.prim_axis)
    data = np.asarray(scene.prim_data)
    flip = np.asarray(scene.prim_flip)
    ptype = np.asarray(scene.prim_type)
    xform = np.asarray(scene.prim_xform)
    # the full-extent untransformed ZX floor at k=0
    floor = ((ptype == PRIM_RECT) & (axis == 1) & (xform == 0)
             & (data[:, 4] == 0.0) & (data[:, 2] == 555.0))
    assert floor.sum() == 1, "duplicate floor must be deduped to one rect"
    # the reference's last-rect-wins tie-break keeps the UNFLIPPED copy
    assert flip[floor][0] == 1.0


def test_rect_tiebreak_keeps_last():
    b = SceneBuilder()
    m_first = b.lambertian(b.solid(1, 0, 0))
    m_last = b.lambertian(b.solid(0, 1, 0))
    b.rect("zx", 0, 0, 1, 1, 0.5, m_first, flip=True)
    b.rect("zx", 0, 0, 1, 1, 0.5, m_last)
    scene = b.build()
    assert scene.num_prims == 1
    assert int(scene.prim_material[0]) == m_last
    assert float(scene.prim_flip[0]) == 1.0


def test_sphere_tiebreak_keeps_first():
    b = SceneBuilder()
    m_first = b.lambertian(b.solid(1, 0, 0))
    m_last = b.lambertian(b.solid(0, 1, 0))
    b.sphere((0, 0, 0), 1.0, m_first)
    b.sphere((0, 0, 0), 1.0, m_last)
    scene = b.build()
    assert scene.num_prims == 1
    assert int(scene.prim_material[0]) == m_first


def test_distinct_geometry_not_deduped():
    b = SceneBuilder()
    m = b.lambertian(b.solid(1, 1, 1))
    b.rect("zx", 0, 0, 1, 1, 0.5, m)
    b.rect("zx", 0, 0, 1, 1, 0.6, m)      # different k
    b.rect("xy", 0, 0, 1, 1, 0.5, m)      # different plane
    xf = b.transform(offset=(1, 0, 0))
    b.rect("zx", 0, 0, 1, 1, 0.5, m, xform=xf)  # different transform
    b.sphere((0, 0, 0), 1.0, m)
    b.sphere((0, 0, 0), 2.0, m)           # different radius
    scene = b.build()
    assert scene.num_prims == 6
