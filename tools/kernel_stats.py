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
        balance=False, scene=None, cam=None) -> dict:
    # callers that already built the scene pass it in — a rebuild costs
    # a duplicate host build + device upload (~0.5 s/transfer through
    # the axon tunnel, CLAUDE.md)
    preset = PRESETS[name]
    if scene is None:
        scene = preset.build()
    if cam is None:
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
        int_kinds, attr_fields, kpix, dda=True))
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
    stats = {"name": name, "nx": nx, "ny": ny, "spp": spp,
             "max_depth": max_depth, "grid": int(grid),
             "n_dyn": int(n_dyn), "n_box": int(n_box),
             "steps_total": tot_steps,
             "steps_per_sample": float(per_tile.mean() / (spp * kpix)),
             "occupancy": float(occ), "kinds": kinds, "groups": groups,
             "mem_s_per_step": 0.0, "mem_b_per_step": 0.0}
    if n_dyn:
        ms = mem_s.reshape(grid, -1)[:, 0]
        stats["mem_s_per_step"] = float(ms.sum() / tot_steps)
        print(f"  sphere member tests/step: {ms.sum() / tot_steps:.1f} "
              f"of {n_dyn} ({100 * ms.sum() / tot_steps / n_dyn:.1f}%)")
    if n_box:
        mb = mem_b.reshape(grid, -1)[:, 0]
        stats["mem_b_per_step"] = float(mb.sum() / tot_steps)
        print(f"  box member tests/step: {mb.sum() / tot_steps:.1f} "
              f"of {n_box} ({100 * mb.sum() / tot_steps / n_box:.1f}%)")
        # DDA probe (VERDICT r3 task 8): of the box member tests the leaf
        # cull lets through, how many would a per-CELL gate — any-lane
        # ray-crosses-this-member's-AABB, i.e. a tile-coherent grid DDA's
        # exact visit set — have run anyway? The difference is the DDA's
        # whole upper bound.
        hb = out[7].reshape(grid, rows, pt.LANES)[:, :pt.SUB]
        hb = hb.reshape(grid, -1)[:, 0]
        stats["dda_cross_per_step"] = float(hb.sum() / tot_steps)
        skip = 1.0 - hb.sum() / max(mb.sum(), 1e-9)
        print(f"  any-lane-crossed (DDA would still visit): "
              f"{hb.sum() / tot_steps:.1f}/step -> a per-cell gate "
              f"could skip {100 * skip:.1f}% of box tests")
    return stats


def vpu_peak(k: int = 16, iters: int = 2_000_000, add_only: bool = True,
             lanes: int = 256, unroll: int = 4):
    """Measured VPU speed-of-light: back-to-back elementwise op issue rate
    on (8, lanes) f32 tiles — (8, 1024) is the megakernel's working shape.

    A Pallas loop carries `k` independent accumulators and issues `unroll`
    ops per accumulator per iteration (alternating +c / -c so the chain
    cannot be constant-folded); the trip count is a traced SMEM scalar so
    Mosaic cannot fold it. Two trip counts are timed and DIFFERENCED,
    cancelling the ~0.5 s dispatch latency of the axon tunnel (CLAUDE.md),
    the kernel's fixed cost, and the loop-carry overhead shared by both.

    add_only=True counts pure adds (one VPU instruction each — the
    conservative peak for MFU accounting); add_only=False issues mul+add
    pairs (counted as 2 ops; if the compiler fuses them to FMA the
    reported rate exceeds the instruction-issue peak, which is why it is
    not the MFU denominator).

    Returns element-ops/second (elements = 8·lanes per op). --peak sweeps
    (k, lanes) and reports the best: k·lanes/128 vector registers of live
    state must fit the register file or Mosaic spills to VMEM and the
    loop measures VMEM bandwidth instead of ALU issue (measured on v5e:
    ≤32 live vregs ≈ 3.4-3.5 T, 128 live vregs ≈ 1.44 T). The default
    (k=16, lanes=256) is the sweep's best on v5e — 3.48 T element-ops/s
    = exactly 8·128 lanes × 2 issues/cycle × 1.7 GHz, so the v5e VPU
    dual-issues f32 adds and the 4-ALU constant below is the UPPER bar.
    """
    import time as _time
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f = jnp.float32

    def kernel(n_ref, o_ref):
        # splat-free init (Mosaic "invalid relayout" trap — CLAUDE.md);
        # iota must be integer-typed on Mosaic
        zero = (lax.broadcasted_iota(jnp.int32, (8, lanes), 0)
                + lax.broadcasted_iota(jnp.int32, (8, lanes), 1)
                ).astype(f) * f(0.0)
        accs = [zero + f(1.0) + f(1e-3) * f(j) for j in range(k)]

        def body(i, accs):
            for u in range(unroll):
                c = f(1e-3) if u % 2 == 0 else f(-1e-3)
                if add_only:
                    accs = [a + c for a in accs]
                else:
                    accs = [a * f(0.9999999) + c for a in accs]
            return accs

        accs = lax.fori_loop(0, n_ref[0], body, accs)
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[...] = out

    call = jax.jit(lambda n: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, lanes), jnp.float32))(n))

    def wall(n):
        arg = np.asarray([n], np.int32)
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            np.asarray(call(arg))          # host pull = real completion
            best = min(best, _time.perf_counter() - t0)
        return best

    wall(1000)                             # compile
    n1, n2 = iters // unroll, 3 * (iters // unroll)
    t1, t2 = wall(n1), wall(n2)
    ops_per_iter = k * unroll * (1 if add_only else 2)
    rate = (n2 - n1) * ops_per_iter * 8 * lanes / max(t2 - t1, 1e-9)
    return rate


# Vector-op cost constants from code inspection of ops/pallas_tracer.py
# (counting every elementwise jnp op on an (8,1024) tile as ONE vector op:
# arithmetic, compares, boolean masks, selects alike — the same convention
# as the RT_ABLATE calibration in docs/DESIGN.md). Derivations in
# DESIGN.md "Speed-of-light accounting".
OPS = {
    # static unrolled loops (fat: attribute selects inline, no extras)
    "sphere_fat": 59,    # oc 3, b 5, c 6, disc 3, sqrt-where 2, roots 5,
                         # windows 8, t/better 3, normal 9, select ~15
    "rect_member": 35,   # t 2, xa/yb 6, window 12, where 1, select ~14
    "rect_group": 36,    # 6 ray·frame dot3 (30), nonpar+inv 3, splats 3
    # thin dynamic loops (carry only t + winner idx; DESIGN.md ablation
    # calibrated the sphere test at ~154 ns ≈ ~30 vector ops)
    "sphere_thin": 30,
    "box_thin": 12,      # grid strip pass member (generic slab ≈ 19)
}

# 8 sublanes x 128 lanes x 4 ALUs x ~1.5 GHz clock. The ALU count and
# clock are public-spec ESTIMATES (the pallas guide documents only the
# (8,128) VPU shape); the measured add-issue rate from vpu_peak() is the
# denominator of record for MFU, this is a secondary sanity bar.
V5E_THEORETICAL = 8 * 128 * 4 * 1.5e9


def mfu(name: str, nx=800, ny=800, spp=32, max_depth=50,
        balance=None, peak=None) -> dict:
    """Achieved-vs-peak VPU utilization for one scene (VERDICT r3 task 2).

    achieved element-ops/s =
        (static member ops/step + measured dyn/box tests/step × thin-test
         ops) × 8·1024 elements × (stats-run total steps / clean-run wall)

    compared against (a) the MEASURED add-issue peak from `vpu_peak` and
    (b) the theoretical 8×128 lanes × 4 ALUs × ~1.5 GHz. This counts
    member-test ops only — the known-dominant section (DESIGN.md ablation:
    ~60% of a final_scene step); the whole-kernel division is done in
    DESIGN.md where the section fractions are recorded.
    """
    import time as _time
    preset = PRESETS[name]
    scene = preset.build()
    cam = preset.camera()
    if balance is None:
        balance = name in ("final_scene", "random_spheres")

    stats = run(name, nx=nx, ny=ny, spp=spp, max_depth=max_depth,
                balance=balance, scene=scene, cam=cam)

    # clean timed render, same config (counters off; best-of-3)
    best = float("inf")
    for _ in range(3):
        t0 = _time.perf_counter()
        img = pt.render_pallas(scene, cam, nx, ny, spp, seed=7,
                               max_depth=max_depth, balance=balance)
        np.asarray(img)
        best = min(best, _time.perf_counter() - t0)

    kinds, groups = stats["kinds"], stats["groups"]
    n_sph_static = sum(1 for k in kinds if k in ("sphere", "moving"))
    n_rect = sum(len(g) for g in groups)
    static_ops = (n_sph_static * OPS["sphere_fat"]
                  + len(groups) * OPS["rect_group"]
                  + n_rect * OPS["rect_member"])
    dyn_ops = (stats["mem_s_per_step"] * OPS["sphere_thin"]
               + stats["mem_b_per_step"] * OPS["box_thin"])
    ops_per_step = static_ops + dyn_ops

    steps_per_s = stats["steps_total"] / best
    achieved = ops_per_step * 8 * 1024 * steps_per_s
    rays_per_s = nx * ny * spp / best

    if peak is None:
        # the peak is a device constant — callers timing several scenes
        # should measure it once and pass it in (the microbench costs a
        # Pallas compile + six timed dispatches over the remote tunnel)
        peak = vpu_peak()
    print(f"\n{name} MFU @ {nx}x{ny} spp {spp} depth {max_depth} "
          f"(balance={balance}):")
    print(f"  wall {best:.2f}s = {rays_per_s / 1e6:.1f}M rays/s, "
          f"{steps_per_s / 1e3:.0f}k wavefront steps/s")
    print(f"  member ops/step: {static_ops} static "
          f"({n_sph_static} spheres, {n_rect} rects in {len(groups)} "
          f"frame groups) + {dyn_ops:.0f} dynamic "
          f"({stats['mem_s_per_step']:.0f} sph x {OPS['sphere_thin']} + "
          f"{stats['mem_b_per_step']:.0f} box x {OPS['box_thin']})")
    print(f"  achieved member-test rate: {achieved / 1e12:.2f} T "
          f"element-ops/s")
    print(f"  measured VPU add-issue peak: {peak / 1e12:.2f} T "
          f"element-ops/s -> {100 * achieved / peak:.0f}% of measured "
          f"speed of light")
    print(f"  theoretical 4-ALU peak: {V5E_THEORETICAL / 1e12:.2f} T "
          f"-> {100 * achieved / V5E_THEORETICAL:.0f}%")
    return {"name": name, "wall_s": best, "rays_per_s": rays_per_s,
            "steps_per_s": steps_per_s, "ops_per_step": ops_per_step,
            "achieved_ops_per_s": achieved, "measured_peak": peak,
            "theoretical_peak": V5E_THEORETICAL,
            "mfu_measured": achieved / peak,
            "mfu_theoretical": achieved / V5E_THEORETICAL}


def main() -> int:
    argv = [a for a in sys.argv[1:]
            if a not in ("--balance", "--mfu", "--peak")]
    balance = "--balance" in sys.argv
    if "--peak" in sys.argv:
        best = (0.0, None)
        for k, lanes in [(4, 1024), (8, 1024), (16, 1024), (32, 1024),
                         (8, 256), (16, 256), (32, 256), (64, 256),
                         (16, 512), (32, 512)]:
            r = vpu_peak(k=k, lanes=lanes, add_only=True)
            print(f"  k={k:3d} lanes={lanes:5d} "
                  f"({k * lanes // 128:4d} vregs live): "
                  f"{r / 1e12:.2f} T add element-ops/s")
            if r > best[0]:
                best = (r, (k, lanes))
        k, lanes = best[1]
        fma_rate = vpu_peak(k=k, lanes=lanes, add_only=False)
        print(f"VPU peak: add-issue {best[0] / 1e12:.2f} T element-ops/s "
              f"(k={k}, lanes={lanes}), mul+add {fma_rate / 1e12:.2f} T "
              f"(FMA-fused if > add rate); theoretical 4-ALU "
              f"{V5E_THEORETICAL / 1e12:.2f} T")
        return 0
    if "--mfu" in sys.argv:
        names = argv or ["cornell_box", "final_scene"]
        peak = vpu_peak()  # device constant: measure once for all scenes
        for name in names:
            # headline configs: walls must sit well above the ~0.2-0.4 s
            # dispatch floor or MFU is dispatch-polluted (cornell at
            # spp 32 is a 0.3 s wall — measured 19%, vs 65% at spp 500)
            mfu(name, spp=500 if name == "cornell_box" else 64, peak=peak)
        return 0
    names = argv or ["final_scene", "random_spheres"]
    for name in names:
        run(name, balance=balance)
    return 0


if __name__ == "__main__":
    sys.exit(main())
