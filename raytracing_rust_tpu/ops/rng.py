"""Stateless, closed-form random samplers.

The reference draws from a global unseeded `rand::thread_rng()` with rejection
loops (reference src/util.rs:4-24) — nondeterministic and shape-dynamic, both
non-starters under XLA. We use counter-based `jax.random` keys plus closed-form
transforms with a *fixed* draw count that sample the *same distributions*:

* `in_unit_sphere` — uniform in the unit ball (matches util.rs:4-13).
* `in_unit_disk`   — uniform in the unit z=0 disk (matches util.rs:15-24).

Every consumer derives its key by folding (bounce, purpose) into a per-batch
key, so renders are bit-reproducible for a given seed and batch layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def in_unit_sphere(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform point in the unit ball from uniforms u[..., 3].

    Closed form replacement for the rejection loop at reference src/util.rs:4-13:
    uniform direction (cos-theta inversion) scaled by U^(1/3) radius.
    """
    cos_t = 2.0 * u[..., 0] - 1.0
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = (2.0 * jnp.pi) * u[..., 1]
    # radius from 1-u, not u: jax.random.uniform is [0,1), and u=0 (one
    # draw in 2^24) would return the EXACT zero vector — an isotropic
    # scatter with a zero direction misses everything and the sky
    # background's normalize emits NaN (observed: one poisoned pixel per
    # ~10M paths). 1-u is uniform on (0,1] — same distribution, no zero.
    # The reference's rejection loop (src/util.rs:4-13) strictly excludes
    # the boundary and returns the origin with probability ~0 in f64.
    r = jnp.cbrt(1.0 - u[..., 2])
    return r[..., None] * jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def in_unit_disk(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform point in the unit disk (z=0) from uniforms u[..., 2].

    Closed form replacement for reference src/util.rs:15-24.
    """
    r = jnp.sqrt(u[..., 0])
    phi = (2.0 * jnp.pi) * u[..., 1]
    zeros = jnp.zeros_like(r)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), zeros], axis=-1)


def lane_uniforms(key: jax.Array, bounce, lane: jnp.ndarray, m: int,
                  dtype=jnp.float32):
    """U[0,1) draws addressed by LANE id → [len(lane), m].

    Lane i's draws depend only on (key, bounce, lane[i]) — never on the
    batch's width or the lane's position in it. This is what makes
    wavefront compaction exact (a gathered survivor keeps its stream) and
    shard-local draw generation possible (a device holding k lanes pays
    O(k), not O(n_total) — a global-table row-gather would generate the
    whole table on every shard). ONE fold + ONE m-vector draw per lane
    per bounce: all of a bounce's purposes slice out of the same vector
    (integrator._bounce), so the per-lane cost matches a plain table
    draw instead of paying a fold per purpose.
    """
    k = jax.random.fold_in(key, bounce)
    ks = jax.vmap(jax.random.fold_in, (None, 0))(k, lane)
    return jax.vmap(lambda kk: jax.random.uniform(kk, (m,), dtype))(ks)
