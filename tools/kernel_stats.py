#!/usr/bin/env python
"""Megakernel wavefront diagnostics on real hardware.

Renders a scene with the kernel's stats mode (extra output rows counting
wavefront steps and dynamic member tests per lane) and reports:

* steps/sample — mean path length through the wavefront, including the
  drain tail (utilization loss at the end of a tile's budget);
* sphere/box member tests per step — how much geometry the cluster cull
  actually lets through (the upper bound is n_dyn / n_box per step).

Timings in stats mode are NOT representative (the counters ride the loop
carries); use tools/bench_scenes.py for throughput.

Run on a TPU host:  python tools/kernel_stats.py [scene ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rt")

import numpy as np  # noqa: E402
import jax  # noqa: E402

from raytracing_rust_tpu.models.builders import PRESETS  # noqa: E402
from raytracing_rust_tpu.ops import pallas_tracer as pt  # noqa: E402


def run(name: str, nx=400, ny=400, spp=32, max_depth=50,
        balance=False) -> None:
    preset = PRESETS[name]
    scene = preset.build()
    cam = preset.camera()
    (rec, kinds, groups, dyn, n_dyn, box, n_box, sclus, n_sclus, bclus,
     n_bclus, med, med_kinds, flags, img, attr, attr_fields, int_rec,
     int_kinds) = pt.build_scene_record(scene)
    cam_np = pt.build_camera_record(cam)
    block = None
    if n_dyn or n_box:
        block = pt.pick_block(nx, ny)   # the renderer's own layout
        grid = -(-nx // block[0]) * (-(-ny // block[1]))
    else:
        grid = -(-nx * ny // pt.TILE)
    dev = jax.devices()[0]
    args = jax.device_put((rec, dyn, box, sclus, bclus, med, cam_np,
                           np.asarray([7, spp, max_depth, 0], np.int32),
                           img, attr), dev)
    pix = None
    kpix = 1
    if balance:
        dev_args0 = jax.device_put((rec, dyn, box, sclus, bclus, med,
                                    img, attr, int_rec), dev)
        # same lane→pixel layout render_pallas builds: kpix must go into
        # the probe (RT_BAL_MODE=spatial chunks by kpix·TILE) and the
        # table comes from the renderer's own builder
        kpix = max(1, min(pt.KPIX, nx * ny // pt.TILE))
        perm = pt._cost_permutation(dev_args0, dev, cam_np, max_depth,
                                    kinds, groups, n_dyn, n_box, n_sclus,
                                    n_bclus, med_kinds, flags, scene,
                                    nx, ny, block, None, int_kinds,
                                    attr_fields, kpix)
        _, grid, pix_full = pt.balanced_pix_table(perm, nx * ny, kpix)
        pix = jax.device_put(pix_full, dev)
        block = None
        print(f"{name} [balanced, kpix={kpix}]:")
    out = np.asarray(pt._trace_call(
        *args, kinds, groups, n_dyn, n_box, n_sclus, n_bclus, med_kinds,
        flags, scene.background, nx, ny, grid, False, None,
        scene.perlin_seed, block, True, pix, jax.device_put(int_rec, dev),
        int_kinds, attr_fields, kpix))
    # stats counters live in bank-0 rows (banks > 0 are zero-padded)
    rows = kpix * pt.SUB
    steps = out[3].reshape(grid, rows, pt.LANES)[:, :pt.SUB]
    mem_s = out[4].reshape(grid, rows, pt.LANES)[:, :pt.SUB]
    mem_b = out[5].reshape(grid, rows, pt.LANES)[:, :pt.SUB]
    busy = out[6].reshape(grid, rows, pt.LANES)[:, :pt.SUB]
    per_tile = steps[:, 0, 0]
    tot_steps = float(per_tile.sum())
    print(f"{name}: grid={grid} n_dyn={n_dyn} n_box={n_box} "
          f"sclus={n_sclus} bclus={n_bclus}")
    print(f"  steps/tile: mean={per_tile.mean():.0f} "
          f"min={per_tile.min():.0f} max={per_tile.max():.0f} "
          f"(spp={spp}, so {per_tile.mean() / (spp * kpix):.1f} "
          f"steps/sample)")
    occ = busy.sum() / (steps.sum() + 1e-9)
    print(f"  lane occupancy: {100 * occ:.1f}% "
          f"(mean busy steps / tile steps; the rest is drain tail)")
    if n_dyn:
        ms = mem_s.reshape(grid, -1)[:, 0]
        print(f"  sphere member tests/step: {ms.sum() / tot_steps:.1f} "
              f"of {n_dyn} ({100 * ms.sum() / tot_steps / n_dyn:.1f}%)")
    if n_box:
        mb = mem_b.reshape(grid, -1)[:, 0]
        print(f"  box member tests/step: {mb.sum() / tot_steps:.1f} "
              f"of {n_box} ({100 * mb.sum() / tot_steps / n_box:.1f}%)")


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--balance"]
    balance = "--balance" in sys.argv
    names = argv or ["final_scene", "random_spheres"]
    for name in names:
        run(name, balance=balance)
    return 0


if __name__ == "__main__":
    sys.exit(main())
