"""Batched Perlin noise (reference src/perlin.rs).

The reference builds 256 random unit gradient vectors plus three Fisher-Yates
permutation tables at texture construction (src/perlin.rs:12-36) and evaluates
Hermite-smoothed trilinear gradient interpolation per point (src/perlin.rs:38-97)
and a 7-octave turbulence sum (src/perlin.rs:99-109).

Deviations from the reference, both deliberate (SURVEY.md §7 quirk (b)):
* tables come from a seeded `np.random.Generator`, not an unseeded thread RNG —
  renders are reproducible;
* lattice coordinates use a true signed floor. The reference's
  `floor(p) as usize` saturates negative coordinates to 0 (degenerate noise for
  p<0); we use the canonical `& 255` wrap for all coordinates.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_tables(seed: int = 0):
    """Host-side table build (reference src/perlin.rs:12-36)."""
    rng = np.random.default_rng(np.uint64(seed) + np.uint64(0x9E3779B97F4A7C15))
    vecs = rng.uniform(-1.0, 1.0, size=(256, 3))
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    perm = np.stack([rng.permutation(256) for _ in range(3)])
    return vecs.astype(np.float32), perm.astype(np.int32)


def noise(ranvec: jnp.ndarray, perm: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Gradient noise for points p[..., 3] (reference src/perlin.rs:58-97)."""
    pf = jnp.floor(p)
    uvw = p - pf  # fractional part in [0,1)
    ijk = pf.astype(jnp.int32)

    # Hermite smoothing (reference src/perlin.rs:39-41)
    s = uvw * uvw * (3.0 - 2.0 * uvw)

    accum = jnp.zeros(p.shape[:-1], p.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                ix = perm[0, (ijk[..., 0] + di) & 255]
                iy = perm[1, (ijk[..., 1] + dj) & 255]
                iz = perm[2, (ijk[..., 2] + dk) & 255]
                g = ranvec[ix ^ iy ^ iz]  # gradient at lattice corner
                w = uvw - jnp.asarray([di, dj, dk], p.dtype)
                dot = jnp.sum(g * w, axis=-1)
                wu = di * s[..., 0] + (1 - di) * (1.0 - s[..., 0])
                wv = dj * s[..., 1] + (1 - dj) * (1.0 - s[..., 1])
                ww = dk * s[..., 2] + (1 - dk) * (1.0 - s[..., 2])
                accum = accum + wu * wv * ww * dot
    return accum


def turb(ranvec: jnp.ndarray, perm: jnp.ndarray, p: jnp.ndarray,
         depth: int = 7) -> jnp.ndarray:
    """Fractal turbulence |Σ 0.5^k noise(2^k p)| (reference src/perlin.rs:99-109)."""
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    weight = 1.0
    q = p
    for _ in range(depth):
        accum = accum + weight * noise(ranvec, perm, q)
        weight *= 0.5
        q = q * 2.0
    return jnp.abs(accum)
