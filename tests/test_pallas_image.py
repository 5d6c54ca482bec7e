"""CPU-side checks for the megakernel's in-kernel image-texture path.

The texel fetch (`_image_fetch`) composes Mosaic's only data-dependent
moves — 128-block lane gathers + 8-deep sublane gathers — into an exact
2D gather; its index algebra is intricate enough to deserve a direct
oracle test, which interpret-mode pallas provides on CPU (no TPU PRNG
involved in this helper). The trig polynomials (`_atan2`/`_asin`) replace
Mosaic-unsupported transcendentals for sphere UV (reference
src/sphere.rs:7-15) and are checked against numpy to their documented
error bound.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from raytracing_rust_tpu.ops import pallas_tracer as pt


def test_atan2_polynomial_matches_numpy():
    rng = np.random.default_rng(3)
    y = rng.uniform(-4, 4, (8, 256)).astype(np.float32)
    x = rng.uniform(-4, 4, (8, 256)).astype(np.float32)
    got = np.asarray(pt._atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x).astype(np.float32)
    assert np.max(np.abs(got - want)) < 5e-7


def test_asin_polynomial_matches_numpy():
    rng = np.random.default_rng(4)
    y = rng.uniform(-1, 1, (8, 256)).astype(np.float32)
    got = np.asarray(pt._asin(jnp.asarray(y)))
    want = np.arcsin(y).astype(np.float32)
    assert np.max(np.abs(got - want)) < 1e-6


def test_image_fetch_exact_gather():
    rng = np.random.default_rng(7)
    n_rows, wpad = 32, 256          # 4 row-chunks, 2 lane blocks
    S, L = 8, 256
    img = rng.integers(0, 2**24, (n_rows, wpad), dtype=np.int32)
    jrow = rng.integers(0, n_rows, (S, L)).astype(np.int32)
    icol = rng.integers(0, wpad, (S, L)).astype(np.int32)

    def kern(img_ref, jr_ref, ic_ref, out_ref):
        out_ref[...] = pt._image_fetch(img_ref, jr_ref[...], ic_ref[...])

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        interpret=True,
    )(jnp.asarray(img), jnp.asarray(jrow), jnp.asarray(icol))
    np.testing.assert_array_equal(np.asarray(out), img[jrow, icol])


def test_sphere_uv_texel_matches_xla_tier():
    """End-to-end UV→texel selection: polynomial trig + int index math
    must pick the same texel as the XLA tier's jnp.arctan2/arcsin path
    (ops/textures.py) for random unit normals."""
    rng = np.random.default_rng(11)
    n = rng.normal(size=(8, 128, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    nx, ny, nz = (jnp.asarray(n[..., i]) for i in range(3))
    h, w = 512, 1024
    f = jnp.float32
    phi = pt._atan2(nz, nx)
    theta = pt._asin(jnp.clip(ny, f(-1.0), f(1.0)))
    uu = f(1.0) - (phi + f(math.pi)) * f(0.5 / math.pi)
    vv = (theta + f(math.pi / 2)) * f(1.0 / math.pi)
    ii = np.clip(np.asarray((uu * w).astype(jnp.int32)), 0, w - 1)
    jj = np.clip(np.asarray(((f(1.0) - vv) * h).astype(jnp.int32)), 0, h - 1)

    phi_np = np.arctan2(n[..., 2], n[..., 0])
    theta_np = np.arcsin(np.clip(n[..., 1], -1, 1))
    u_np = 1.0 - (phi_np + np.pi) / (2 * np.pi)
    v_np = (theta_np + np.pi / 2) / np.pi
    ii_np = np.clip((u_np * w).astype(np.int32), 0, w - 1)
    jj_np = np.clip(((1.0 - v_np) * h).astype(np.int32), 0, h - 1)
    assert (ii == ii_np).mean() > 0.999
    assert (jj == jj_np).mean() > 0.999


def test_attr_gather_exact():
    """Thin-path attribute resolution: fields[f][s, l] must equal
    attr[f, col[s, l]] exactly (bit patterns preserved via the int32
    round-trip)."""
    rng = np.random.default_rng(9)
    n_bands, P_pad = 4, 384
    attr_f32 = rng.normal(size=(pt.ATTR_ROWS, P_pad)).astype(np.float32)
    attr = attr_f32.view(np.int32)
    S, L = 8, 256
    col = rng.integers(0, P_pad, (S, L)).astype(np.int32)

    def kern(attr_ref, col_ref, out_ref):
        fl = pt._attr_gather(attr_ref, col_ref[...], n_bands)
        for k in range(8 * n_bands):
            out_ref[k] = fl[k]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8 * n_bands, S, L), jnp.float32),
        interpret=True,
    )(jnp.asarray(attr), jnp.asarray(col))
    out = np.asarray(out)
    for f in range(8 * n_bands):
        np.testing.assert_array_equal(out[f], attr_f32[f][col])
