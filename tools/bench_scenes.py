#!/usr/bin/env python
"""Per-scene megakernel throughput at the reference's own render configs.

BASELINE.md's table pins each scene's (resolution, spp) as hard-coded in
the reference's tests (/root/reference/tests/test.rs); this sweeps all of
them on the Pallas tier and prints best-of-3 primary rays/s (tunnel wall
times jitter up to 3x — CLAUDE.md). Depth 50 everywhere (src/color.rs:9).

Run on a TPU host:  python tools/bench_scenes.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rt")


from raytracing_rust_tpu.models.builders import PRESETS  # noqa: E402
from raytracing_rust_tpu.ops.pallas_tracer import render_pallas  # noqa: E402

CONFIGS = [
    # (scene, nx, ny, spp) — reference test configs (tests/test.rs)
    ("cornell_box", 800, 800, 100),
    ("cornell_smoke", 800, 800, 100),
    ("final_scene", 800, 800, 100),
    ("random_spheres", 1280, 720, 100),
    ("simple_light", 1280, 720, 100),
    ("earth", 1280, 720, 10),
    ("two_perlin_spheres", 1280, 720, 10),
    ("two_spheres", 1280, 720, 10),
]


def main() -> int:
    for name, nx, ny, spp in CONFIGS:
        preset = PRESETS[name]
        scene = preset.build()
        cam = preset.camera()
        # warm at spp>=8 so cost-balanced scheduling engages and the
        # TIMED reps reuse the balanced kernel's compile (a spp-2 warm
        # compiles the unbalanced variant the timed run never uses)
        render_pallas(scene, cam, nx, ny, min(spp, 8), seed=9)  # compile
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            render_pallas(scene, cam, nx, ny, spp, seed=r)
            best = min(best, time.perf_counter() - t0)
        rays = nx * ny * spp
        print(f"{name}: {nx}x{ny}x{spp} best {best:.2f}s = "
              f"{rays / best / 1e6:.1f}M rays/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
