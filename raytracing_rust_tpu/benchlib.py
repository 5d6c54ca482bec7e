"""Throughput benchmark: rays/sec/chip on the BASELINE.json headline config
(cornell_box 800×800 @ 500 spp).

The reference publishes no performance numbers at all (BASELINE.md: README is
3 lines, no benchmarks dir). `vs_baseline` is therefore computed against a
documented order-of-magnitude estimate of the reference's single-threaded CPU
renderer: ~2e5 primary rays/s for a depth-50 recursive f64 tracer over an
18-object Cornell scene (the class of renderer in tests/test.rs:55-85). This
constant is a stand-in, not a measurement — the reference cannot run here
(no Rust toolchain) and publishes nothing.

Metric definition: primary rays per wall-clock second on one chip =
nx·ny·spp / t. Each primary ray carries its full bounce tree (up to 51
segments, reference src/color.rs:9), so this undercounts total traced
segments by the mean path length — it is the honest end-to-end number a user
of `create_image` would measure.
"""

from __future__ import annotations

import json
import time

REFERENCE_EST_RAYS_PER_SEC = 2.0e5  # documented estimate, see module docstring


def run(scene: str = "cornell_box_baseline", spp: int | None = None,
        nx: int | None = None, ny: int | None = None, seed: int = 0,
        engine: str = "auto"):
    import jax
    from .models.builders import PRESETS
    from .ops.pallas_tracer import UnsupportedScene, render_pallas
    from .render import render

    preset = PRESETS[scene]
    nx = nx or preset.nx
    ny = ny or preset.ny
    spp = spp or preset.spp
    tables = preset.build()
    cam = preset.camera()

    use_pallas = engine in ("auto", "pallas")
    if use_pallas:
        try:  # warmup doubles as the support check
            render_pallas(tables, cam, nx, ny, 2, seed=seed)
        except UnsupportedScene:
            if engine == "pallas":
                raise
            use_pallas = False

    # best-of-5: device dispatch goes through a remote tunnel whose latency
    # jitter can double a single-shot wall time
    reps = 5 if use_pallas else 1
    dt = float("inf")
    for r in range(reps):
        if use_pallas:
            t0 = time.perf_counter()
            render_pallas(tables, cam, nx, ny, spp, seed=seed + r)
            dt = min(dt, time.perf_counter() - t0)
        else:
            warm_spp = min(spp, 4)
            render(tables, cam, nx, ny, warm_spp, seed=seed,
                   spp_chunk=warm_spp)
            t0 = time.perf_counter()
            render(tables, cam, nx, ny, spp, seed=seed, spp_chunk=warm_spp)
            dt = min(dt, time.perf_counter() - t0)

    rays_per_sec = nx * ny * spp / dt
    return {
        "metric": f"primary rays/sec/chip ({scene} {nx}x{ny} {spp}spp)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_EST_RAYS_PER_SEC, 2),
        "wall_seconds": round(dt, 2),
        "engine": "pallas" if use_pallas else "xla",
        "device": str(jax.devices()[0]),
    }


def to_json(result: dict) -> str:
    return json.dumps(result)
