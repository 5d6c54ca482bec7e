#!/usr/bin/env python
"""Isolated timings for the megakernel's hot building blocks on real
hardware: one tiny pallas kernel per block runs it K times in a fori
loop over synthetic data, so per-call cost falls out of the slope
without any path-tracing semantics in the way.

Blocks measured:
* attr_gather   — the thin hit path's winner-attribute gather
                  (bands × sublanes × blocks × 128-wide lane gathers)
* sphere_member — one thin sphere intersection test (SMEM scalars)
* box_member    — one thin merged-box slab test
* any_reduce    — jnp.any of an (8, LANES) mask to a scalar
* or_tree       — the packed 31-decision OR-tree reduce (_or_reduce)

Run on a TPU host:  python tools/microbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rt")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from raytracing_rust_tpu.ops import pallas_tracer as pt  # noqa: E402

S, L = pt.SUB, pt.LANES
f = jnp.float32


def _time(fn, *args):
    np.asarray(fn(*args))  # compile + TRUE sync (CLAUDE.md: only a
    # host pull blocks through the tunnel; an unmaterialized warmup
    # dispatch would bleed into rep 1's timing)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    # --- attr_gather: 4 bands over a 1408-prim table (final_scene) ---
    attr = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 2 ** 20, (pt.ATTR_ROWS, 1408 + (-1408) % 128),
            dtype=np.int32))

    def gather_kernel_factory(n_bands):
        def make(k):
            def kernel(attr_ref, col_ref, out_ref):
                def body(i, acc):
                    col = (col_ref[...] + i) % 1400
                    fl = pt._attr_gather(attr_ref, col, n_bands)
                    return acc + fl[0]

                out_ref[...] = jax.lax.fori_loop(
                    0, k, body, jnp.zeros((S, L), f))

            @jax.jit
            def run(a, c):
                return pl.pallas_call(
                    kernel,
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
                )(a, c)

            return run

        return make

    col = jnp.asarray(np.random.default_rng(1).integers(
        0, 1400, (S, L), dtype=np.int32))
    for n_bands in (4, 2):
        make = gather_kernel_factory(n_bands)
        t1 = _time(make(2), attr, col)
        t2 = _time(make(22), attr, col)
        print(f"attr_gather[{n_bands} bands] {(t2 - t1) / 20 * 1e6:8.1f} "
              f"µs/call", flush=True)

    # --- member tests + reduces (synthetic scalars in SMEM) ---
    rec = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, (64, pt.REC)).astype(np.float32))

    def member_kernel_factory(kind):
        def make(k):
            def kernel(rec_ref, x_ref, out_ref):
                xf = x_ref[...].astype(f) * f(1e-3)
                ox = oy = oz = xf
                dx, dy, dz = xf + f(0.1), xf + f(0.2), xf + f(0.3)
                a_dd = dx * dx + dy * dy + dz * dz
                inv_a = f(1.0) / a_dd

                def body(p, st):
                    t_b, wi = st

                    def r(i):
                        return rec_ref[p % 64, i]

                    if kind == "sphere":
                        ocx, ocy, ocz = ox - r(0), oy - r(1), oz - r(2)
                        bq = ocx * dx + ocy * dy + ocz * dz
                        cq = (ocx * ocx + ocy * ocy + ocz * ocz
                              - r(3))
                        disc = bq * bq - a_dd * cq
                        pos = disc > f(0.0)
                        sq = jnp.sqrt(jnp.where(pos, disc, f(1.0)))
                        t_near = (-bq - sq) * inv_a
                        t_far = (-bq + sq) * inv_a
                        t_sel = jnp.where(t_near > f(1e-3), t_near,
                                          t_far)
                        ok = pos & (t_sel > f(1e-3)) & (t_sel < t_b)
                    elif kind == "box":
                        def si(dc):
                            return jnp.where(jnp.abs(dc) < f(1e-30),
                                             f(1e30), f(1.0) / dc)

                        ix, iy, iz = si(dx), si(dy), si(dz)
                        t0 = (r(0) - ox) * ix
                        t1 = (r(3) - ox) * ix
                        tmn = jnp.minimum(t0, t1)
                        tmx = jnp.maximum(t0, t1)
                        t0 = (r(1) - oy) * iy
                        t1 = (r(4) - oy) * iy
                        tmn = jnp.maximum(tmn, jnp.minimum(t0, t1))
                        tmx = jnp.minimum(tmx, jnp.maximum(t0, t1))
                        t0 = (r(2) - oz) * iz
                        t1 = (r(5) - oz) * iz
                        tmn = jnp.maximum(tmn, jnp.minimum(t0, t1))
                        tmx = jnp.minimum(tmx, jnp.maximum(t0, t1))
                        t_sel = jnp.where(tmn > f(1e-3), tmn, tmx)
                        ok = (tmx > tmn) & (t_sel > f(1e-3)) \
                            & (t_sel < t_b)
                    elif kind == "any":
                        ok = (xf + p.astype(f)) > f(0.5)
                        n = jnp.any(ok).astype(f)
                        return (t_b + n, wi)
                    else:  # or_tree
                        m = (xf > f(0.0)).astype(jnp.int32) << (p % 31)
                        n = pt._or_reduce(m).astype(f)
                        return (t_b + n, wi)
                    return (jnp.where(ok, t_sel, t_b),
                            jnp.where(ok, p.astype(f), wi))

                t_b = jnp.full((S, L), f(3e38))
                wi = jnp.zeros((S, L), f)
                t_b, wi = jax.lax.fori_loop(0, k, body, (t_b, wi))
                out_ref[...] = t_b + wi

            @jax.jit
            def run(rr, x):
                return pl.pallas_call(
                    kernel,
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
                )(rr, x)

            return run

        return make

    x = jnp.asarray(np.random.default_rng(3).integers(
        0, 997, (S, L), dtype=np.int32))
    for kind in ("sphere", "box", "any", "or_tree"):
        make = member_kernel_factory(kind)
        t1 = _time(make(64), rec, x)
        t2 = _time(make(1064), rec, x)
        print(f"{kind:16s} {(t2 - t1) / 1000 * 1e9:8.0f} ns/call",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
