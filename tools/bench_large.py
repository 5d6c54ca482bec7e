#!/usr/bin/env python
"""Large-scene scaling: dense scan vs BVH vs megakernel across prim
counts (VERDICT r4 task 4 — substantiate or retract the "large scenes"
claim; reference src/bvh.rs:9-94 exists exactly for this regime).

Measures end-to-end render() wall (best of `--reps`) on the CURRENT
backend for each n in --n: the dense-XLA tier, the BVH-XLA tier, and —
on TPU — the Pallas megakernel. Rays/s = nx·ny·spp / wall.

    python tools/bench_large.py                 # TPU (axon)
    python tools/bench_large.py --cpu           # pinned CPU
    python tools/bench_large.py --n 1000 30000 --spp 4

The measured table lives in docs/DESIGN.md "Large scenes"; render()'s
use_bvh='auto' policy is set from it.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rt")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+",
                    default=[1000, 3000, 10000, 30000, 100000])
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--ny", type=int, default=36)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-dense-above", type=int, default=10**9,
                    help="skip the dense tier above this prim count")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from raytracing_rust_tpu.models.builders import (big_spheres,
                                                     big_spheres_camera)
    from raytracing_rust_tpu.render import render

    on_tpu = jax.devices()[0].platform == "tpu"
    print(f"backend: {jax.devices()[0]}  config {args.nx}x{args.ny} "
          f"spp {args.spp} depth {args.depth} (best of {args.reps})")
    rays = args.nx * args.ny * args.spp

    def timed(fn):
        fn()  # compile + warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            img = fn()
            np.asarray(img)
            best = min(best, time.perf_counter() - t0)
        return best, img

    print(f"{'prims':>8} {'dense rays/s':>14} {'bvh rays/s':>14} "
          f"{'pallas rays/s':>14} {'dense mean':>11} {'bvh mean':>11}")
    for n in args.n:
        scene = big_spheres(n)
        P = scene.num_prims
        cam = big_spheres_camera(n, args.nx, args.ny)
        row = {}
        means = {}
        if P <= args.skip_dense_above:
            t, img = timed(lambda: render(scene, cam, args.nx, args.ny,
                                          args.spp, max_depth=args.depth,
                                          use_bvh=False))
            row["dense"] = rays / t
            means["dense"] = float(np.asarray(img).mean())
        t, img = timed(lambda: render(scene, cam, args.nx, args.ny,
                                      args.spp, max_depth=args.depth,
                                      use_bvh=True))
        row["bvh"] = rays / t
        means["bvh"] = float(np.asarray(img).mean())
        if on_tpu:
            try:
                from raytracing_rust_tpu.ops.pallas_tracer import \
                    render_pallas
                t, img = timed(lambda: render_pallas(
                    scene, cam, args.nx, args.ny, args.spp,
                    max_depth=args.depth))
                row["pallas"] = rays / t
            except Exception as e:
                row["pallas"] = None
                print(f"  (pallas failed at n={n}: "
                      f"{type(e).__name__}: {str(e)[:120]})")
        fmt = lambda k: (f"{row[k]:14.0f}" if row.get(k) else f"{'—':>14}")
        fm = lambda k: (f"{means[k]:11.4f}" if k in means else f"{'—':>11}")
        print(f"{P:>8} {fmt('dense')} {fmt('bvh')} {fmt('pallas')} "
              f"{fm('dense')} {fm('bvh')}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
