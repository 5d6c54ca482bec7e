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

import jax.numpy as jnp
import numpy as np

import oracle
from raytracing_rust_tpu.models.builders import cornell_box
from raytracing_rust_tpu.models.scene import PRIM_RECT, SceneBuilder
from raytracing_rust_tpu.ops.intersect import closest_hit


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


def test_overlapping_rects_diverge_from_scan_order():
    """DOCUMENTED DEVIATION (README "Parity with the reference"): equal-t
    ties between NON-identical coincident geometry resolve by argmin (first
    scene index), not by the reference's scan order (last rect wins —
    src/hittable.rs:37-47 with Rect::hit's `t > t_max` reject accepting
    equality, src/rect.rs:45-47). Build-time dedup only covers
    bit-identical duplicates, so two PARTIALLY overlapping coplanar rects
    genuinely diverge in their overlap. No shipped reference scene contains
    such a pair; this test demonstrates the divergence so the deviation is
    pinned, and fails loudly if either semantics silently changes."""
    rects = [("zx", 0.0, 0.0, 2.0, 2.0, 0.5),   # A: x∈[0,2], z∈[0,2]
             ("zx", 1.0, 1.0, 3.0, 3.0, 0.5)]   # B: x∈[1,3], z∈[1,3]
    b = SceneBuilder()
    mats = [b.lambertian(b.solid(1, 0, 0)), b.lambertian(b.solid(0, 1, 0))]
    for (plane, a0, b0, a1, b1, k), m in zip(rects, mats):
        b.rect(plane, a0, b0, a1, b1, k, m)
    scene = b.build()
    assert scene.num_prims == 2  # partially overlapping: NOT deduped

    # straight down through the overlap square (both rects hit at equal t)
    o = np.array([[1.5, 5.0, 1.5]], np.float32)
    d = np.array([[0.0, -1.0, 0.0]], np.float32)
    hit = closest_hit(scene, jnp.asarray(o), jnp.asarray(d),
                      jnp.zeros(1), 1e-3)
    ours = int(hit.idx[0])

    # the reference's HittableList scan: shrinking closest_so_far, rect
    # accepting t == t_max (oracle.rect_hit mirrors rect.rs:45-47)
    closest, ref_winner = np.inf, -1
    for i, (plane, a0, b0, a1, b1, k) in enumerate(rects):
        r = oracle.rect_hit(plane, a0, b0, a1, b1, k, o[0].astype(np.float64),
                            d[0].astype(np.float64), 1e-3, closest)
        if r is not None:
            closest, ref_winner = r[0], i

    assert ours == 0, "framework argmin must pick the FIRST coincident rect"
    assert ref_winner == 1, "reference scan order picks the LAST rect"
    assert ours != ref_winner  # the documented divergence, demonstrated


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
