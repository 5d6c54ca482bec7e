#!/usr/bin/env python
"""TPU-side tier parity check: megakernel vs XLA wavefront.

The megakernel can't run in the CPU test suite (the TPU core PRNG has no
CPU lowering), so this script is the hardware-side complement to tests/:
it renders every megakernel-capable scene on BOTH tiers with independent
RNG and asserts the converged means agree within Monte-Carlo error.

Run on a TPU host:  python tools/tpu_parity.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

from raytracing_rust_tpu.models.builders import PRESETS  # noqa: E402
from raytracing_rust_tpu.ops.pallas_tracer import (  # noqa: E402
    UnsupportedScene, render_pallas)
from raytracing_rust_tpu.render import render  # noqa: E402

CONFIGS = {
    # scene: (nx, ny, spp, depth, mean rel tolerance)
    "two_spheres": (96, 54, 64, 12, 0.02),
    "random_spheres": (96, 54, 64, 12, 0.02),
    "simple_light_solid": None,   # noise texture — XLA only, skipped
    "cornell_box": (64, 64, 128, 16, 0.04),
    "cornell_smoke": (64, 64, 128, 16, 0.04),
}


def main() -> int:
    failures = 0
    for name, cfg in CONFIGS.items():
        if cfg is None or name not in PRESETS:
            continue
        nx, ny, spp, depth, tol = cfg
        preset = PRESETS[name]
        scene = preset.build()
        cam = preset.camera()
        try:
            t0 = time.time()
            a = render_pallas(scene, cam, nx, ny, spp, seed=0,
                              max_depth=depth)
            tp = time.time() - t0
        except UnsupportedScene as e:
            print(f"{name}: SKIP ({e})")
            continue
        t0 = time.time()
        b = render(scene, cam, nx, ny, spp, seed=1, max_depth=depth)
        tx = time.time() - t0
        ma, mb = float(a.mean()), float(b.mean())
        rel = abs(ma - mb) / max(mb, 1e-6)
        ok = np.isfinite(a).all() and rel < tol
        print(f"{name}: pallas={ma:.4f} ({tp:.0f}s) xla={mb:.4f} ({tx:.0f}s)"
              f" rel={rel:.3f} tol={tol} {'OK' if ok else 'FAIL'}")
        failures += 0 if ok else 1
    print("PARITY PASS" if failures == 0 else f"PARITY FAIL ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
