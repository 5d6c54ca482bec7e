#!/usr/bin/env python
"""Per-bounce alive-fraction profile of the XLA wavefront.

The measurement behind wavefront compaction (docs/DESIGN.md "Wavefront
compaction"): how many bounces the full-width while_loop runs vs the
mean path length, and the alive fraction at each depth — i.e. how much
bounce-width the uncompacted tier wastes on dead lanes.

Runs on CPU (the bounce math is identical across backends; this is a
path-statistics probe, not a timing one).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from raytracing_rust_tpu.models import builders  # noqa: E402
from raytracing_rust_tpu.ops.integrator import _bounce  # noqa: E402
from raytracing_rust_tpu.ops.intersect import pack_prims  # noqa: E402
from raytracing_rust_tpu.render import camera_lane_rays  # noqa: E402


def profile(name: str, n: int = 16384, max_depth: int = 50,
            seed: int = 0) -> dict:
    preset = builders.PRESETS[name]
    scene = preset.build()
    cam = preset.camera()
    key = jax.random.key(seed)
    pid = jax.random.randint(jax.random.fold_in(key, 9), (n,), 0,
                             preset.nx * preset.ny, jnp.int32)
    o, d, time = camera_lane_rays(cam, pid, key, preset.nx, preset.ny)
    pack = pack_prims(scene)
    thr = jnp.ones_like(o)
    rad = jnp.zeros_like(o)
    alive = jnp.ones(n, bool)
    fracs = []
    for b in range(max_depth + 1):
        fracs.append(float(alive.mean()))
        o, d, thr, rad, alive = _bounce(scene, pack, key, max_depth, b, o,
                                        d, time, thr, rad, alive)
        if not bool(alive.any()):
            break
    fr = np.asarray(fracs)
    return {"scene": name, "bounces_run": len(fr),
            "mean_path": float(fr.sum()),
            "waste": len(fr) / float(fr.sum()),
            "alive": fr}


if __name__ == "__main__":
    names = sys.argv[1:] or ["cornell_box", "final_scene", "two_spheres",
                             "cornell_smoke"]
    for name in names:
        r = profile(name)
        fr = r["alive"]
        a10 = fr[10] if len(fr) > 10 else 0.0
        a20 = fr[20] if len(fr) > 20 else 0.0
        print(f"{name:20s} bounces_run={r['bounces_run']:3d} "
              f"mean_path={r['mean_path']:5.2f} "
              f"full/mean={r['waste']:4.1f}x "
              f"alive@10={a10:.4f} alive@20={a20:.5f}")
