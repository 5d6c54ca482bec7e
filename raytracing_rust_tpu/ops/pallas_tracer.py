"""Pallas TPU wavefront megakernel — the performance tier of the renderer.

The XLA baseline (`ops/integrator.py`) round-trips every per-lane state array
through HBM on every bounce and materializes [N, P, 3] intersection temps;
on a TPU that makes the render HBM-bound ~200x below the VPU's speed of
light. This kernel inverts the layout:

* one grid step owns a (8, LANES) tile of pixels that lives in
  VMEM/registers for the WHOLE render: ray generation, the full bounce loop,
  and the spp accumulation all happen inside the kernel. HBM traffic is the
  final radiance image — nothing else;
* the primitive loop is unrolled at trace time over per-primitive SCALARS
  held in SMEM (the flattened world-space PrimPack + shading record), so
  intersection is pure [8, LANES] VPU arithmetic — no gathers, no [N, P]
  temps;
* materials/textures are resolved per-primitive at pack time (solid color,
  checker colors, emission, fuzz/ref_idx as scalars in the same record), so
  shading is masked elementwise selects like `ops/materials.py` but on
  register tiles;
* RNG is the TPU core PRNG (`pltpu.prng_seed` / `prng_random_bits`), seeded
  per grid step — a different (but equally deterministic-per-seed)
  counter-based stream than the XLA tier's threefry.

Coverage: sphere / moving-sphere / rect primitives, instance transforms
(pre-hoisted into world space by `pack_prims`), lambertian / metal /
dielectric / diffuse-light materials, solid + checker + Perlin-marble
textures, black / sky backgrounds — i.e. the reference scenes cornell_box,
two_spheres, random_spheres (the BASELINE.json headline config included),
two_perlin_spheres, simple_light. Constant-density media (ConstantMedium,
analytic sphere/box boundaries with hoisted transforms) run in-kernel too,
with a dense-medium walk fast path for sealed subsurface volumes.
Noise textures are evaluated fully in-kernel: the hash-gradient Perlin
(ops/perlin.py — the framework's table-free redesign of reference
src/perlin.rs) is pure per-lane VPU arithmetic, so the kernel shares
`_gradient` with the XLA tier and the two tiers agree to f32 ulps. Image
textures fetch in-kernel from a packed u8 atlas (earth included), so every
reference scene runs here; the XLA tier (`render(engine='xla')`) remains
the general fallback and the differentiable path.

Dynamic scenes (beyond the ≤96-prim unroll) get four scheduling/culling
layers, each chosen by measurement (docs/DESIGN.md): wide-guard bitmask
culls (31 any-lane gates per OR-tree reduce), cost-balanced pixel
scheduling (a smoothed probe sorts pixels into cost-alike tiles),
multi-pixel lane banks (each lane renders KPIX snake-striped cost ranks
into mask-selected accumulator banks, averaging per-sample path noise
the pixel sort cannot reach), and the dense-medium walk. final_scene
runs 7.3M primary rays/s, random_spheres 46M, the cornell headline
~400M.

Semantics match the reference math exactly like the XLA tier does
(src/sphere.rs:37-77, src/rect.rs:39-69, src/material.rs:35-131,
src/color.rs:6-23); only the RNG stream differs (SURVEY.md §4: the
reference is unseeded, so per-draw parity was never possible).
"""

from __future__ import annotations

import math
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene import (SceneTables, BG_SKY, MAT_LAMBERTIAN, MAT_METAL,
                            MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_ISOTROPIC,
                            TEX_SOLID, TEX_CHECKER, TEX_NOISE, TEX_IMAGE,
                            PRIM_RECT)
from .intersect import pack_prims
from .perlin import _gradient

BIG = 3.0e38
T_MIN = 1e-3   # reference src/color.rs:7

# lane tile: (SUB, LANES) f32 = native (8, 128k) VPU tiling. RT_LANES
# overrides for hardware A/B (smaller tiles → finer-grained cluster
# guards and more coherent pixel blocks, but fixed per-step work
# amortizes over fewer rays).
SUB = 8
LANES = int(os.environ.get("RT_LANES", "1024"))
TILE = SUB * LANES

# per-primitive scalar record layout (f32[P, REC])
R_IS_SPHERE = 0
R_C0 = 1          # 1..3  world center at time0
R_DC = 4          # 4..6  center span (moving)
R_T0 = 7
R_INV_DT = 8
R_RADIUS = 9
R_R2 = 10
R_KN = 11         # 11..13 rect plane normal (world)
R_AN = 14         # 14..16 rect a axis
R_BN = 17         # 17..19 rect b axis
R_KOFF = 20
R_AOFF = 21
R_BOFF = 22
R_A0, R_A1, R_B0, R_B1 = 23, 24, 25, 26
R_FLIP = 27
R_MAT = 28        # material type tag as float
R_PARAM = 29      # fuzz / ref_idx
R_EMIT = 30       # 30..32
R_ALB_EVEN = 33   # 33..35
R_ALB_ODD = 36    # 36..38
R_CHECKER = 39
R_NOISE = 40      # 1.0 ⇒ marble (Perlin turbulence) albedo
R_NSCALE = 41     # noise scale (reference src/texture.rs:66-70)
R_IMG = 42        # 1.0 ⇒ image-texture albedo (reference src/texture.rs:73-108)
R_IMG_BASE = 43   # first row of this prim's image in the packed atlas
R_IMG_H = 44      # true image height (pre-padding)
R_IMG_W = 45      # true image width
REC = 46

# camera scalar record (f32[CAMREC])
C_ORIGIN, C_LL, C_HORIZ, C_VERT, C_U, C_V = 0, 3, 6, 9, 12, 15
C_LENS_R, C_TIME0, C_DTIME = 18, 19, 20
CAMREC = 21

# per-medium scalar record (f32[M, MEDREC]); reference src/medium.rs
M_DATA = 0        # sphere: cx,cy,cz,r2 | box: pmin3, pmax3
M_INV_RHO = 6     # 1/density
M_ROT = 7        # 7..15 world→object rotation R₋ row-major
M_OFF = 16        # 16..18 translate offset
M_ALB = 19        # 19..21 isotropic albedo (checker: even color)
# non-solid isotropic albedo (reference Isotropic is texture-generic,
# src/material.rs:153-173; medium hits carry u=v=0, src/medium.rs:44-50):
# a medium scatter event overwrites the winner's texture state with these
# fields, and the shared checker/noise/image blocks evaluate at the
# scatter point (med_tex static flag)
M_ALB_ODD = 22    # 22..24 checker odd color
M_CHK = 25
M_NOISE = 26
M_NSCALE = 27
M_IMG = 28
M_IMG_BASE = 29
M_IMG_H = 30
M_IMG_W = 31
MEDREC = 32

# transposed attribute table for the thin hit path: fields along
# SUBLANES, primitives along LANES (f32[32, P_pad]), so one 128-block
# take_along_axis fetches 8 fields of each lane's winning primitive at
# once (_attr_gather). Bands of 8: 0-1 always, 2 always (albedo),
# 3 only when noise/image textures exist.
A_TYPE = 0        # 0 sphere/moving, 1 rect, 2 box
A_G0 = 1          # 1..3: sphere c0 | rect kn | box lo
A_G3 = 4          # 4..6: sphere dc |   0     | box hi
A_T0 = 7
A_INVDT = 8
A_INVR = 9        # 1/radius (sphere), 0 otherwise
A_FLIP = 10
A_MAT = 11
A_PARAM = 12
A_EMIT = 13       # 13..15
A_ALB_E = 16      # 16..18
A_ALB_O = 19      # 19..21
A_CHECKER = 22
A_NOISE = 23
A_NSCALE = 24     # band 3 from here
A_IMG = 25
A_IMG_BASE = 26
A_IMG_H = 27
A_IMG_W = 28
ATTR_ROWS = 32

# the kernel's extra-field resolution uses fl[fid - 17] (attribute-pass
# select), which is only correct while the R_ALB_ODD..R_IMG_W run
# mirrors A_ALB_O..A_IMG_W at a constant offset — pin it at import time
# so inserting a field in either layout fails loudly instead of
# silently shading with the wrong attribute
for _rf, _af in ((R_ALB_ODD, A_ALB_O), (R_CHECKER, A_CHECKER),
                 (R_NOISE, A_NOISE), (R_NSCALE, A_NSCALE),
                 (R_IMG, A_IMG), (R_IMG_BASE, A_IMG_BASE),
                 (R_IMG_H, A_IMG_H), (R_IMG_W, A_IMG_W)):
    assert _rf - _af == 17, (
        f"record/attr layout drift: R{_rf} - A{_af} != 17")


UNROLL_BUDGET = 96  # prims unrolled at trace time; spheres beyond go dynamic
SPH_LEAF = int(os.environ.get("RT_SPH_LEAF", "16"))  # sphere leaf size
BOX_LEAF = int(os.environ.get("RT_BOX_LEAF", "8"))   # box leaf size

# Cull strategy for the dynamic member loops (measurable on hardware with
# RT_CULL=two|sup|leaf|flat): every guard's any-reduce collapses an
# (8, LANES) mask to one scalar, which on v5e costs roughly as much as a
# dozen member tests — so MORE guards is not automatically faster.
#   wide — one bitmask pass: every leaf's cross mask is packed into
#          int32 lanes and collapsed with ONE roll-tree OR-reduce per 31
#          leaves, so leaf-grain skipping costs ~2 reduces per table
#          instead of one per guard (default; measured fastest)
#   two  — supercluster guards over leaf guards (finest skipping)
#   sup  — supercluster guards only; a crossed super runs its whole
#          contiguous member range unguarded (fewest reduces)
#   leaf — leaf guards only (no super level)
#   flat — no guards at all (pure member scan)
CULL = os.environ.get("RT_CULL", "wide")
# grid-specialized ground-box strip pass (A/B: RT_GRID=0 restores the
# generic culled box loop on grid scenes)
GRID = os.environ.get("RT_GRID", "1") == "1"

# gate the winner-attribute resolution pass behind any(winner)? The gate
# skips a ~600-op gather on winnerless steps, but its fori carries the
# full shading state through the loop boundary every step — measurable
# either way, hence the A/B toggle
RESOLVE_GATE = os.environ.get("RT_RESOLVE_GATE", "1") == "1"

# cost-balanced pixel scheduling default (see render_pallas balance=)
BALANCE = os.environ.get("RT_BALANCE", "1") == "1"

# pixels per lane under balanced scheduling (RT_KPIX): a tile's wall time
# is max over lanes of that lane's total path work, so giving each lane K
# pixels drawn from K different cost quartiles (snake-striped ranks)
# averages both the per-pixel cost differences and the per-sample path
# noise over K·spp samples — the drain tail shrinks ~√K. Each lane keeps
# K radiance accumulators (bank = scnt // spp, arithmetic masks; no
# per-lane scatter) and the output carries K·SUB rows per tile.
KPIX = int(os.environ.get("RT_KPIX", "4"))

# RT_ABLATE=members,static,resolve,media,image,noise,walk — compile kernels
# with whole sections removed, for per-step cost attribution at
# max_depth=1 (where every sample is exactly one wavefront step, so
# removing a section cannot change path lengths). Ablated kernels
# render WRONG images; timing diagnostics only.
ABLATE = frozenset(filter(None, os.environ.get("RT_ABLATE",
                                               "").split(",")))


class UnsupportedScene(ValueError):
    """Scene uses features outside the megakernel's coverage."""


def _merge_boxes(rec, kinds):
    """Collapse runs of 6 axis-aligned rects that tile a box (the
    reference's Cube, src/cube.rs:20-74) into single box rows.

    A box row reuses the REC layout: lo in R_C0..+3, hi in R_DC..+3,
    material fields verbatim from the member rects. The kernel's box
    intersector reproduces the 6-rect semantics exactly (entry/exit face
    via the slab test, face normal = +axis like the reference's rects).
    Returns (box_rows [B, REC], member_mask [P] bool).
    """
    P = len(kinds)
    member = np.zeros(P, bool)
    boxes = []
    tol = 1e-4

    def unit_axis(v):
        a = int(np.argmax(np.abs(v)))
        if abs(abs(v[a]) - 1.0) > 1e-6 or np.sum(np.abs(v)) > 1.0 + 1e-6:
            return None, 0.0
        return a, float(np.sign(v[a]))

    p = 0
    while p + 6 <= P:
        run = list(range(p, p + 6))
        if any(kinds[q] != "rect" for q in run):
            p += 1
            continue
        # identical material/shading fields across the run — EXACT:
        # allclose's default rtol would let fields differing by <1e-5
        # relative merge and shade all six faces with the first rect's
        if not np.array_equal(rec[run, R_FLIP:REC],
                              np.broadcast_to(rec[p, R_FLIP:REC],
                                              rec[run, R_FLIP:REC].shape)):
            p += 1
            continue
        # image-textured faces need per-rect UV frames the box row drops
        # (a box winner resolves with no rect frame) — stay unrolled
        if rec[p, R_IMG] != 0.0:
            p += 1
            continue
        faces = {}   # k-axis -> [plane offsets]; plus world bounds check
        ok = True
        lo = np.full(3, np.inf)
        hi = np.full(3, -np.inf)
        planes = []
        for q in run:
            ka, ks = unit_axis(rec[q, R_KN:R_KN + 3])
            aa, _ = unit_axis(rec[q, R_AN:R_AN + 3])
            ba, _ = unit_axis(rec[q, R_BN:R_BN + 3])
            if ka is None or aa is None or ba is None or ks < 0:
                ok = False
                break
            koff = rec[q, R_KOFF] * ks
            a0 = rec[q, R_A0] + rec[q, R_AOFF]
            a1 = rec[q, R_A1] + rec[q, R_AOFF]
            b0 = rec[q, R_B0] + rec[q, R_BOFF]
            b1 = rec[q, R_B1] + rec[q, R_BOFF]
            faces.setdefault(ka, []).append(koff)
            planes.append((ka, aa, ba, a0, a1, b0, b1))
            lo[ka] = min(lo[ka], koff)
            hi[ka] = max(hi[ka], koff)
            lo[aa], hi[aa] = min(lo[aa], a0), max(hi[aa], a1)
            lo[ba], hi[ba] = min(lo[ba], b0), max(hi[ba], b1)
        if ok:
            ok = sorted(faces) == [0, 1, 2] and \
                all(len(v) == 2 for v in faces.values())
        if ok:
            for ka, aa, ba, a0, a1, b0, b1 in planes:
                if (abs(a0 - lo[aa]) > tol or abs(a1 - hi[aa]) > tol
                        or abs(b0 - lo[ba]) > tol or abs(b1 - hi[ba]) > tol):
                    ok = False
                    break
        if not ok:
            p += 1
            continue
        row = rec[p].copy()
        row[:R_FLIP] = 0.0
        row[R_C0:R_C0 + 3] = lo
        row[R_DC:R_DC + 3] = hi
        boxes.append(row)
        member[run] = True
        p += 6
    box_rows = (np.stack(boxes).astype(np.float32) if boxes
                else np.zeros((0, REC), np.float32))
    return box_rows, member


def _attr_field_list(dyn_rec, box_rec, n_dyn, n_box):
    """Static tuple of the A_* fields the thin hit path actually needs
    for THIS table's prims. Measured on v5e: the winner-attribute
    gather costs ~7 µs per 8-field band per step and runs on nearly
    every step, so fields that are identically zero for every dynamic
    prim (e.g. final_scene's noise/image — those live on unrolled
    heroes) must not ride along."""
    rows = ([dyn_rec[i] for i in range(n_dyn)]
            + [box_rec[i] for i in range(n_box)])

    def used(col):
        return any(r[col] != 0.0 for r in rows)

    fields = []
    if n_box:
        fields.append(A_TYPE)
    fields += [A_G0, A_G0 + 1, A_G0 + 2, A_G3, A_G3 + 1, A_G3 + 2]
    if any(r[R_INV_DT] != 0.0 for r in rows):
        fields += [A_T0, A_INVDT]
    fields += [A_INVR, A_FLIP, A_MAT]
    if any(r[R_MAT] in (MAT_METAL, MAT_DIELECTRIC) for r in rows):
        fields.append(A_PARAM)
    fields += [A_EMIT, A_EMIT + 1, A_EMIT + 2,
               A_ALB_E, A_ALB_E + 1, A_ALB_E + 2]
    if used(R_CHECKER):
        fields += [A_ALB_O, A_ALB_O + 1, A_ALB_O + 2, A_CHECKER]
    if used(R_NOISE):
        fields += [A_NOISE, A_NSCALE]
    if used(R_IMG):
        fields += [A_IMG, A_IMG_BASE, A_IMG_H, A_IMG_W]
    return tuple(fields)


def _build_attr_table(dyn_rec, box_rec, n_dyn, n_box, fields):
    """Transposed attribute table for the thin hit path (host side).

    Columns are winner indices in thin-path order: dynamic spheres,
    then boxes; rows are the COMPACT static field list from
    _attr_field_list (row i = fields[i]), padded to a multiple of 8 so
    the kernel gathers whole bands. Stored as int32 bit patterns so the
    kernel's lane gathers take the exact code path proven by the image
    fetch; the kernel bitcasts fields back to f32.
    """
    cols = []

    def add(row, kind):
        # rects never reach the thin path (they are always unrolled);
        # A_TYPE=1 is reserved if that ever changes
        a = np.zeros(ATTR_ROWS, np.float32)
        if kind == "box":
            a[A_TYPE] = 2.0
            a[A_G0:A_G0 + 3] = row[R_C0:R_C0 + 3]
            a[A_G3:A_G3 + 3] = row[R_DC:R_DC + 3]
        else:
            a[A_TYPE] = 0.0
            a[A_G0:A_G0 + 3] = row[R_C0:R_C0 + 3]
            a[A_G3:A_G3 + 3] = row[R_DC:R_DC + 3]
            a[A_T0] = row[R_T0]
            a[A_INVDT] = row[R_INV_DT]
            a[A_INVR] = 1.0 / row[R_RADIUS] if row[R_RADIUS] else 0.0
        a[A_FLIP] = row[R_FLIP]
        a[A_MAT] = row[R_MAT]
        a[A_PARAM] = row[R_PARAM]
        a[A_EMIT:A_EMIT + 3] = row[R_EMIT:R_EMIT + 3]
        a[A_ALB_E:A_ALB_E + 3] = row[R_ALB_EVEN:R_ALB_EVEN + 3]
        a[A_ALB_O:A_ALB_O + 3] = row[R_ALB_ODD:R_ALB_ODD + 3]
        a[A_CHECKER] = row[R_CHECKER]
        a[A_NOISE] = row[R_NOISE]
        a[A_NSCALE] = row[R_NSCALE]
        a[A_IMG] = row[R_IMG]
        a[A_IMG_BASE] = row[R_IMG_BASE]
        a[A_IMG_H] = row[R_IMG_H]
        a[A_IMG_W] = row[R_IMG_W]
        cols.append(a[list(fields)])

    for i in range(n_dyn):
        add(dyn_rec[i], "sphere")
    for i in range(n_box):
        add(box_rec[i], "box")
    if not cols:
        cols.append(np.zeros(len(fields), np.float32))
    tab = np.stack(cols, axis=1)                 # (len(fields), P_total)
    pad = -(-tab.shape[1] // 128) * 128
    n_rows = -(-len(fields) // 8) * 8
    out = np.zeros((n_rows, pad), np.float32)
    out[:tab.shape[0], :tab.shape[1]] = tab
    return out.view(np.int32)


SUP_FANOUT = 8      # leaf clusters per supercluster (two-level cull)


def _cluster_rows(rows, lo, hi, leaf):
    """Recursive median split on AABB centroids → two-level flat clusters.

    Returns (rows reordered cluster-contiguously, table f32[L+S, 8],
    n_leaf, n_sup). Rows [0, n_leaf) are leaf clusters (lo3, hi3,
    member_start, member_count); rows [n_leaf, n_leaf+n_sup) are
    superclusters (lo3, hi3, leaf_start, leaf_count) whose ranges index
    the leaf rows. The kernel slab-tests a supercluster AABB against the
    whole lane tile and skips ALL of its leaf guards when no live lane
    can hit it, then guards each surviving leaf the same way before its
    member loop (lane-coherent two-level cull). Superclusters follow
    subtree boundaries of the same median split, so they are as tight
    as the leaves they cover. n_sup == 0 when one level is enough
    (≤ SUP_FANOUT leaves) — the kernel then loops the leaves directly.
    """
    clusters = []
    supers = []
    order = []

    def split(idx):
        if len(idx) <= leaf:
            start = len(order)
            order.extend(idx.tolist())
            clo, chi = lo[idx].min(0), hi[idx].max(0)
            clusters.append([*clo, *chi, float(start), float(len(idx))])
            return
        cen = (lo[idx] + hi[idx]) * 0.5
        ax = int(np.argmax(cen.max(0) - cen.min(0)))
        ordax = np.argsort(cen[:, ax], kind="stable")
        half = len(idx) // 2
        split(idx[ordax[:half]])
        split(idx[ordax[half:]])

    def split_top(idx):
        if len(idx) <= leaf * SUP_FANOUT:
            first = len(clusters)
            split(idx)
            clo, chi = lo[idx].min(0), hi[idx].max(0)
            supers.append([*clo, *chi, float(first),
                           float(len(clusters) - first)])
            return
        cen = (lo[idx] + hi[idx]) * 0.5
        ax = int(np.argmax(cen.max(0) - cen.min(0)))
        ordax = np.argsort(cen[:, ax], kind="stable")
        half = len(idx) // 2
        split_top(idx[ordax[:half]])
        split_top(idx[ordax[half:]])

    if len(rows):
        split_top(np.arange(len(rows)))
    if len(clusters) <= SUP_FANOUT:
        supers = []  # one level is enough; skip the outer guards
    table = clusters + supers
    return (rows[np.asarray(order, int)] if order else rows,
            np.asarray(table, np.float32) if table
            else np.zeros((1, 8), np.float32),
            len(clusters), len(supers))


def _grid_cluster_rows(box_rows):
    """Detect a regular NI×NJ ground-box grid and build strip clusters.

    final_scene's 400 ground boxes (reference tests/test.rs:424-438) are a
    20×20 grid: shared y_lo, x/z bounds on one pitch w, only heights vary.
    The kernel's grid strip pass (see the `grid_spec` branch in
    _make_kernel) exploits that structure: the y_lo plane is hoisted per
    step, the x-slab per strip, and each member pays only its y_hi plane
    and z-slab — roughly half the generic box slab test, on the scene's
    dominant cost (~2/3 of its ~600 member tests/step).

    Returns (rows strip-ordered (x-major, z-ascending), cluster table
    [NI leaf strips + supers, 8], n_leaf, n_sup, NI, NJ) or None when the
    boxes are not a grid. Leaf row i is strip i's AABB
    [x_i, x_i+w] × [y_lo, max_j h_ij] × [z_0, z_0+NJ·w] with
    (start=i·NJ, count=NJ); supers group SUP_FANOUT strips for the root
    fold. The layout is a valid generic cluster table too, so non-"wide"
    cull modes and the CPU tripwire run the same rows unspecialized.
    """
    B = len(box_rows)
    if B < 16:
        return None  # not worth a specialized pass
    lo = box_rows[:, R_C0:R_C0 + 3]
    hi = box_rows[:, R_DC:R_DC + 3]
    ylo = lo[0, 1]
    if not np.all(lo[:, 1] == ylo):
        return None
    xs = np.unique(lo[:, 0])
    zs = np.unique(lo[:, 2])
    ni, nj = len(xs), len(zs)
    if ni < 2 or nj < 2 or ni * nj != B:
        return None
    w = float(xs[1] - xs[0])
    if w <= 0:
        return None
    tol = 1e-4 * w
    if not (np.allclose(np.diff(xs), w, rtol=0, atol=tol)
            and np.allclose(np.diff(zs), w, rtol=0, atol=tol)
            and np.allclose(hi[:, 0] - lo[:, 0], w, rtol=0, atol=tol)
            and np.allclose(hi[:, 2] - lo[:, 2], w, rtol=0, atol=tol)):
        return None
    i_idx = np.rint((lo[:, 0] - xs[0]) / w).astype(int)
    j_idx = np.rint((lo[:, 2] - zs[0]) / w).astype(int)
    cells = i_idx * nj + j_idx
    if len(np.unique(cells)) != B:
        return None
    order = np.argsort(cells)
    rows = np.ascontiguousarray(box_rows[order])
    # the kernel's incremental z-exit assumes hi_z = lo_z + w with ONE
    # shared f32 pitch; require that exactly so tz1 = tz0 + w·inv_dz is
    # the same plane the resolve pass recomputes (up to one rounding)
    w32 = np.float32(rows[0, R_DC + 2] - rows[0, R_C0 + 2])
    if not np.all((rows[:, R_DC + 2] - rows[:, R_C0 + 2]) == w32):
        return None
    leaves = []
    for i in range(ni):
        strip = rows[i * nj:(i + 1) * nj]
        # the strip x-slab must be BIT-identical to every member's own
        # x planes (the attribute resolve matches faces by exact t
        # equality, so the hoisted (lo_x − ox)·inv_dx must equal the
        # per-box recomputation)
        if (not np.all(strip[:, R_C0] == strip[0, R_C0])
                or not np.all(strip[:, R_DC] == strip[0, R_DC])):
            return None
        # leaves are BOX_LEAF-member z-SEGMENTS of the strip, not whole
        # strips: a full-z strip AABB is too coarse a cull (measured
        # +20% box member tests/step on final_scene, which ate the
        # cheap test's savings); segments restore the generic leaves'
        # granularity while every member keeps the grid-form test
        for s in range(0, nj, BOX_LEAF):
            seg = strip[s:s + BOX_LEAF]
            leaves.append(np.concatenate([
                [strip[0, R_C0], ylo, seg[0, R_C0 + 2]],
                [strip[0, R_DC], seg[:, R_DC + 1].max(),
                 seg[-1, R_DC + 2]],
                [i * nj + s, len(seg)]]))
    supers = []
    for s in range(0, len(leaves), SUP_FANOUT):
        grp = np.stack(leaves[s:s + SUP_FANOUT])
        supers.append(np.concatenate([
            grp[:, 0:3].min(0), grp[:, 3:6].max(0),
            [s, len(grp)]]))
    table = np.asarray(leaves + supers, np.float32)
    return rows, table, len(leaves), len(supers), ni, nj


def build_scene_record(scene: SceneTables):
    """Flatten SceneTables into the [P, REC] scalar record (host side).

    Returns (record, kinds, rect_groups, dyn_rec, n_dyn, box_rec, n_box,
    sclus, n_sclus, bclus, n_bclus, med_rec, med_kinds, flags,
    img_packed, attr), where n_sclus/n_bclus are static (n_leaf, n_sup)
    pairs describing the two-level cluster tables (_cluster_rows) and
    attr is the transposed thin-hit-path attribute table
    (_build_attr_table, int32[32, P_pad]): kinds /
    med_kinds are static tuples controlling the per-primitive /
    per-medium unrolls; rect_groups groups unrolled rect rows by shared
    world plane frame (kn, an, bn) so the kernel computes the six
    ray·frame dot products once per FRAME instead of once per rect
    (cornell's 18 rects share 9 frames). Scenes with more than
    UNROLL_BUDGET primitives move their spheres into dyn_rec and their
    axis-aligned cubes (runs of 6 rects tiling a box — the reference's
    Cube, src/cube.rs:20-74) into box_rec, both cluster-sorted with
    cluster AABB tables (sclus/bclus, f32[C, 8] = lo3+hi3+start+count)
    the kernel slab-tests to skip whole leaves per bounce; leftover
    rects must fit the unroll; moving spheres prefer the unroll (when
    they fit) so the dynamic loop serves static spheres without the
    center lerp. flags is a static (has_checker, has_metal, has_diel,
    has_noise, has_image, dyn_moving) tuple that gates whole shading /
    intersection blocks out of scenes that don't use them; img_packed is the
    u8-packed image atlas for the in-kernel texel fetch ((8, 128) zeros
    when unused). Raises UnsupportedScene for the few features with no
    in-kernel path: nested checker textures, image textures on ROTATED
    spheres, non-8-bit-exact images, oversized atlases, and non-box
    rects beyond the unroll budget (emissive textures, flipped image
    spheres, image rects, and textured media are all in-kernel since
    round 3 — see lattice_scene).
    """
    # One batched host pull + CPU-backend packing. The scene tables live
    # on the (possibly remote) accelerator; the dozens of per-field and
    # per-prim reads below would each cost a full device roundtrip
    # (~0.5 s through the axon tunnel — record_build measured 19 s on a
    # TWO-prim scene before this).
    scene = jax.device_get(scene)
    cpu0 = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu0):
        pk = jax.tree.map(np.asarray, pack_prims(scene))
    ptype = np.asarray(scene.prim_type)
    mat_type = np.asarray(scene.mat_type)
    mat_param = np.asarray(scene.mat_param)
    mat_tex = np.asarray(scene.mat_texture)
    tex_type = np.asarray(scene.tex_type)
    tex_color = np.asarray(scene.tex_color)
    tex_child = np.asarray(scene.tex_child)
    prim_mat = np.asarray(scene.prim_material)
    P = len(ptype)

    from ..models.scene import PRIM_MOVING_SPHERE

    rec = np.zeros((P, REC), np.float32)
    kinds = []
    has_emissive_tex = False  # any DiffuseLight with a non-solid texture
    for p in range(P):
        if ptype[p] == PRIM_RECT:
            k = "rect"
        elif ptype[p] == PRIM_MOVING_SPHERE:
            k = "moving"
        else:
            k = "sphere"
        kinds.append(k)
        rec[p, R_IS_SPHERE] = 0.0 if k == "rect" else 1.0
        rec[p, R_C0:R_C0 + 3] = pk.c0[p]
        rec[p, R_DC:R_DC + 3] = pk.dc[p]
        rec[p, R_T0] = pk.t0[p]
        rec[p, R_INV_DT] = pk.inv_dt[p]
        rec[p, R_RADIUS] = pk.radius[p]
        rec[p, R_R2] = pk.r2[p]
        rec[p, R_KN:R_KN + 3] = pk.kn[p]
        rec[p, R_AN:R_AN + 3] = pk.an[p]
        rec[p, R_BN:R_BN + 3] = pk.bn[p]
        rec[p, R_KOFF] = pk.k_off[p]
        rec[p, R_AOFF] = pk.a_off[p]
        rec[p, R_BOFF] = pk.b_off[p]
        rec[p, R_A0] = pk.a0[p]
        rec[p, R_A1] = pk.a1[p]
        rec[p, R_B0] = pk.b0[p]
        rec[p, R_B1] = pk.b1[p]
        rec[p, R_FLIP] = np.asarray(scene.prim_flip)[p]

        m = prim_mat[p]
        mt = int(mat_type[m])
        if mt not in (MAT_LAMBERTIAN, MAT_METAL, MAT_DIELECTRIC,
                      MAT_DIFFUSE_LIGHT):
            raise UnsupportedScene(f"material type {mt} needs the XLA tier")
        rec[p, R_MAT] = float(mt)
        rec[p, R_PARAM] = mat_param[m]
        tx = mat_tex[m]
        tt = int(tex_type[tx])
        # DiffuseLight is texture-generic in the reference (emitted() =
        # texture.value, src/material.rs:133-151): non-solid textures fill
        # the same albedo/texture fields as scattering materials and the
        # kernel's emission fixup adds the evaluated value for light
        # winners (emis_tex flag); solid lights keep the cheap R_EMIT path.
        if tt == TEX_SOLID:
            color = tex_color[tx]
            if mt == MAT_DIFFUSE_LIGHT:
                rec[p, R_EMIT:R_EMIT + 3] = color
            else:
                rec[p, R_ALB_EVEN:R_ALB_EVEN + 3] = color
        elif tt == TEX_CHECKER:
            odd, even = tex_child[tx]
            if tex_type[odd] != TEX_SOLID or tex_type[even] != TEX_SOLID:
                raise UnsupportedScene("nested checker")
            rec[p, R_ALB_ODD:R_ALB_ODD + 3] = tex_color[odd]
            rec[p, R_ALB_EVEN:R_ALB_EVEN + 3] = tex_color[even]
            rec[p, R_CHECKER] = 1.0
        elif tt == TEX_NOISE:
            # marble albedo, evaluated in-kernel (reference
            # src/texture.rs:66-70)
            rec[p, R_NOISE] = 1.0
            rec[p, R_NSCALE] = np.asarray(scene.tex_scale)[tx]
        elif tt == TEX_IMAGE:
            # nearest-texel image albedo, fetched in-kernel from the packed
            # u8 atlas (reference src/texture.rs:73-108). Sphere UV comes
            # from the winner's world normal (pre-flip via the carried flip
            # when img_flip is set); rect UV is computed at selection time
            # from the world-frame projections (valid for rotated rects —
            # the frame is world-space, matching ops/intersect.py
            # hit_attributes). Rotated image SPHERES would need the
            # per-prim R₋ for the object normal — XLA tier only.
            xf = int(np.asarray(scene.prim_xform)[p])
            if (k != "rect"
                    and (float(np.asarray(scene.xf_sin)[xf]) != 0.0
                         or float(np.asarray(scene.xf_cos)[xf]) != 1.0)):
                raise UnsupportedScene("image texture on a rotated sphere")
            img_id = int(np.asarray(scene.tex_image)[tx])
            image_hw = np.asarray(scene.image_hw)
            rec[p, R_IMG] = 1.0
            rec[p, R_IMG_BASE] = float(img_id * scene.images.shape[1])
            rec[p, R_IMG_H] = float(image_hw[img_id, 0])
            rec[p, R_IMG_W] = float(image_hw[img_id, 1])
        else:
            raise UnsupportedScene(f"texture type {tt} needs the XLA tier")
        if mt == MAT_DIFFUSE_LIGHT and tt != TEX_SOLID:
            has_emissive_tex = True

    # ---- media (reference src/medium.rs; ConstantMedium w/ convex
    # analytic boundary, possibly Traslate∘Rotate-wrapped) ----
    from ..models.scene import MED_SPHERE

    med_kinds = []
    live_media = [m for m in range(scene.num_media)
                  if float(np.asarray(scene.med_density)[m]) != 0.0]
    med_rec = np.zeros((max(len(live_media), 1), MEDREC), np.float32)
    med_type = np.asarray(scene.med_type)
    med_data = np.asarray(scene.med_data)
    med_density = np.asarray(scene.med_density)
    med_material = np.asarray(scene.med_material)
    med_xform = np.asarray(scene.med_xform)
    xf_axis = np.asarray(scene.xf_axis)
    xf_sin = np.asarray(scene.xf_sin)
    xf_cos = np.asarray(scene.xf_cos)
    xf_off = np.asarray(scene.xf_offset)
    for i, m in enumerate(live_media):
        kind = "msphere" if med_type[m] == MED_SPHERE else "mbox"
        med_kinds.append(kind)
        if kind == "msphere":
            med_rec[i, M_DATA:M_DATA + 3] = med_data[m, 0:3]
            med_rec[i, M_DATA + 3] = med_data[m, 3] ** 2  # r²
        else:
            med_rec[i, M_DATA:M_DATA + 6] = med_data[m, 0:6]
        med_rec[i, M_INV_RHO] = 1.0 / med_density[m]
        # world→object rotation R₋ (reference src/rotate.rs:87-97): for
        # axis r with (a,b)=((r+1)%3,(r+2)%3): out[a]=c·v[a]+s·v[b],
        # out[b]=−s·v[a]+c·v[b], out[r]=v[r]
        xf = med_xform[m]
        ax, s, c = int(xf_axis[xf]), float(xf_sin[xf]), float(xf_cos[xf])
        a, bb = (ax + 1) % 3, (ax + 2) % 3
        R = np.zeros((3, 3), np.float32)
        R[ax, ax] = 1.0
        R[a, a], R[a, bb] = c, s
        R[bb, a], R[bb, bb] = -s, c
        med_rec[i, M_ROT:M_ROT + 9] = R.reshape(-1)
        med_rec[i, M_OFF:M_OFF + 3] = xf_off[xf]
        iso_tex = mat_tex[med_material[m]]
        itt = int(tex_type[iso_tex])
        if itt == TEX_SOLID:
            med_rec[i, M_ALB:M_ALB + 3] = tex_color[iso_tex]
        elif itt == TEX_CHECKER:
            odd, even = tex_child[iso_tex]
            if tex_type[odd] != TEX_SOLID or tex_type[even] != TEX_SOLID:
                raise UnsupportedScene("nested checker (medium albedo)")
            med_rec[i, M_ALB:M_ALB + 3] = tex_color[even]
            med_rec[i, M_ALB_ODD:M_ALB_ODD + 3] = tex_color[odd]
            med_rec[i, M_CHK] = 1.0
        elif itt == TEX_NOISE:
            med_rec[i, M_NOISE] = 1.0
            med_rec[i, M_NSCALE] = np.asarray(scene.tex_scale)[iso_tex]
        elif itt == TEX_IMAGE:
            img_id = int(np.asarray(scene.tex_image)[iso_tex])
            image_hw = np.asarray(scene.image_hw)
            med_rec[i, M_IMG] = 1.0
            med_rec[i, M_IMG_BASE] = float(img_id * scene.images.shape[1])
            med_rec[i, M_IMG_H] = float(image_hw[img_id, 0])
            med_rec[i, M_IMG_W] = float(image_hw[img_id, 1])
        else:
            raise UnsupportedScene(
                f"medium albedo texture {itt} needs the XLA tier")

    has_med_tex = bool(len(live_media)
                       and np.any(med_rec[:, (M_CHK, M_NOISE, M_IMG)] > 0))
    flags = (bool(np.any(rec[:, R_CHECKER] > 0)
                  or np.any(med_rec[:, M_CHK] > 0)),
             bool(np.any(rec[:, R_MAT] == MAT_METAL)),
             bool(np.any(rec[:, R_MAT] == MAT_DIELECTRIC)),
             bool(np.any(rec[:, R_NOISE] > 0)
                  or np.any(med_rec[:, M_NOISE] > 0)),
             bool(np.any(rec[:, R_IMG] > 0)
                  or np.any(med_rec[:, M_IMG] > 0)))

    # ---- packed image atlas: one int32 (r<<16 | g<<8 | b) per texel so
    # the in-kernel 2D gather runs once instead of three times. The
    # builder stores u8-sourced images as f32(u8/255) (models/scene.py
    # image()); requiring the exact u8 round-trip keeps the kernel's
    # u8f/255 texels bit-identical to the XLA tier's atlas values. ----
    img_packed = np.zeros((8, 128), np.int32)
    if flags[4]:
        atlas = np.asarray(scene.images, np.float32)       # (I, H, W, 3)
        q = np.clip(np.rint(atlas * 255.0), 0, 255).astype(np.int32)
        if not np.array_equal(q.astype(np.float32) / np.float32(255.0),
                              atlas):
            raise UnsupportedScene("image texture is not 8-bit exact")
        I, H, W, _ = q.shape
        rows, wpad = I * H, max(-(-W // 128) * 128, 128)
        img_packed = np.zeros((-(-rows // 8) * 8, wpad), np.int32)
        img_packed[:rows, :W] = (
            (q[..., 0] << 16) | (q[..., 1] << 8) | q[..., 2]
        ).reshape(rows, W)
        if img_packed.nbytes > 8 * 2 ** 20:
            raise UnsupportedScene("image atlas too large for VMEM")

    # partition: small scenes unroll everything; big scenes unroll the
    # leftover rects, collapse axis-aligned cubes into box rows, and run
    # spheres + boxes through cluster-culled dynamic SMEM loops
    dyn_rec = np.zeros((1, REC), np.float32)
    n_dyn = 0
    box_rec = np.zeros((1, REC), np.float32)
    n_box = 0
    sclus = np.zeros((1, 8), np.float32)
    bclus = np.zeros((1, 8), np.float32)
    n_sclus = (0, 0)
    n_bclus = (0, 0)
    if P > UNROLL_BUDGET:
        is_rect = np.array([k == "rect" for k in kinds])
        box_rows, in_box = _merge_boxes(rec, kinds)
        rect_left = is_rect & ~in_box
        if int(rect_left.sum()) > UNROLL_BUDGET:
            raise UnsupportedScene(
                f"{int(rect_left.sum())} non-box rects exceed the "
                "unrolled-loop budget; the XLA tier handles this scene")
        # moving spheres prefer the unrolled loop when they fit: the
        # thin dynamic loop then drops the center lerp for every static
        # member (final_scene's ONE moving sphere would otherwise tax
        # its 1005 static spheres with the moving-center math every
        # bounce). All-or-nothing so dyn_moving stays a static property.
        is_moving = np.array([k == "moving" for k in kinds])
        keep = rect_left
        if int(rect_left.sum() + is_moving.sum()) <= UNROLL_BUDGET:
            keep = rect_left | is_moving
        # "hero" spheres — much larger than the population median — also
        # prefer the unroll: they are hit often, and testing them BEFORE
        # the cluster loops seeds each lane's running-best t so the
        # cluster guards' (tmn < t_b) cull has teeth (measured on
        # final_scene: without this, t_b is still BIG when the guards
        # run and ~40% of all members pass; with it, guard pass rates
        # collapse for lanes on/inside the heroes)
        sph_left = ~is_rect & ~keep
        if sph_left.any():
            radii = rec[:, R_RADIUS]
            med_r = float(np.median(radii[sph_left]))
            hero = sph_left & (radii >= 4.0 * max(med_r, 1e-20))
            room = UNROLL_BUDGET - int(keep.sum())
            if int(hero.sum()) > room:   # keep only the largest fits
                order = np.argsort(-radii * hero)
                hero = np.zeros_like(hero)
                hero[order[:room]] = radii[order[:room]] > 0
                hero &= sph_left
            keep = keep | hero
        # dynamic spheres, cluster-sorted; AABB = swept center ± r
        sph = rec[~is_rect & ~keep]
        n_dyn = len(sph)
        if n_dyn:
            c0 = sph[:, R_C0:R_C0 + 3]
            c1 = c0 + sph[:, R_DC:R_DC + 3]
            r_ = sph[:, R_RADIUS:R_RADIUS + 1]
            dyn_rec, sclus, *n_sclus = _cluster_rows(
                np.ascontiguousarray(sph), np.minimum(c0, c1) - r_,
                np.maximum(c0, c1) + r_, SPH_LEAF)
            n_sclus = tuple(n_sclus)
        n_box = len(box_rows)
        if n_box:
            g = _grid_cluster_rows(box_rows) if GRID else None
            if g is not None:
                # regular grid: strip-major rows + strip clusters; the
                # 4-tuple n_bclus carries (NI, NJ) to the kernel's
                # grid strip pass (see build_scene_record docstring)
                box_rec, bclus, *n_bclus = g
                n_bclus = tuple(n_bclus)
            else:
                box_rec, bclus, *n_bclus = _cluster_rows(
                    box_rows, box_rows[:, R_C0:R_C0 + 3],
                    box_rows[:, R_DC:R_DC + 3], BOX_LEAF)
                n_bclus = tuple(n_bclus)
        rec = np.ascontiguousarray(rec[keep])
        kinds = [k for i, k in enumerate(kinds) if keep[i]]
        if not kinds:  # SMEM inputs need at least one row
            rec = np.zeros((1, REC), np.float32)

    # static kernel properties: does the dynamic sphere loop need the
    # moving-center lerp at all? the sphere-UV compat quirk
    # (SceneTables.compat_uv_bug, reference src/sphere.rs:13), and the
    # feature-lattice corners (emissive textures, selection-time rect UV /
    # medium-image UV carry, pre-flip image normals, textured media)
    all_rows = [rec] + ([dyn_rec[:n_dyn]] if n_dyn else []) \
        + ([box_rec[:n_box]] if n_box else [])
    all_rows = np.concatenate(all_rows, axis=0)
    uv_carry = bool(
        any(k == "rect" and rec[i, R_IMG] > 0 for i, k in enumerate(kinds))
        or np.any(med_rec[:, M_IMG] > 0))
    img_flip = bool(np.any((all_rows[:, R_IMG] > 0)
                           & (all_rows[:, R_FLIP] < 0)))
    flags = flags + (bool(n_dyn
                          and np.any(dyn_rec[:n_dyn, R_INV_DT] != 0.0)),
                     bool(scene.compat_uv_bug),
                     bool(has_emissive_tex), uv_carry, img_flip,
                     bool(has_med_tex))

    # ---- dense-medium walk fast path (host analysis) ----
    # A medium whose mean free path is much smaller than its extent
    # turns every entering path into a long isotropic random walk
    # (final_scene's subsurface sphere: mfp 5 vs diameter 140 ⇒ paths
    # run to the depth-50 cap, dominating the frame). The kernel
    # collapses those walks in a cheap inner loop that only needs the
    # prims reachable from inside the medium; compute that interior set
    # here (conservative AABB overlap) plus per-medium dense flags.
    def _row_aabb(row, kind):
        if kind in ("sphere", "moving"):
            c0 = row[R_C0:R_C0 + 3]
            c1 = c0 + row[R_DC:R_DC + 3]
            r = abs(row[R_RADIUS])
            return np.minimum(c0, c1) - r, np.maximum(c0, c1) + r
        if kind == "box":
            return row[R_C0:R_C0 + 3].copy(), row[R_DC:R_DC + 3].copy()
        # rect: p·kn = KOFF, p·an ∈ AOFF+[A0,A1], p·bn ∈ BOFF+[B0,B1]
        kn, an, bn = (row[R_KN:R_KN + 3], row[R_AN:R_AN + 3],
                      row[R_BN:R_BN + 3])
        pts = [(a + row[R_AOFF]) * an + (b + row[R_BOFF]) * bn
               + row[R_KOFF] * kn
               for a in (row[R_A0], row[R_A1])
               for b in (row[R_B0], row[R_B1])]
        pts = np.stack(pts)
        return pts.min(0) - 1e-4, pts.max(0) + 1e-4

    med_dense = []
    med_aabbs = []
    for i, mk in enumerate(med_kinds):
        R = med_rec[i, M_ROT:M_ROT + 9].reshape(3, 3)
        off = med_rec[i, M_OFF:M_OFF + 3]
        if mk == "msphere":
            c, r = med_rec[i, M_DATA:M_DATA + 3], \
                float(np.sqrt(med_rec[i, M_DATA + 3]))
            olo, ohi = c - r, c + r
            extent = 2.0 * r
        else:
            olo, ohi = (med_rec[i, M_DATA:M_DATA + 3],
                        med_rec[i, M_DATA + 3:M_DATA + 6])
            extent = float((ohi - olo).min())
        corners = np.stack([
            R.T @ np.array([(olo, ohi)[a][0], (olo, ohi)[b][1],
                            (olo, ohi)[c_][2]]) + off
            for a in (0, 1) for b in (0, 1) for c_ in (0, 1)])
        med_aabbs.append((corners.min(0), corners.max(0)))
        med_dense.append(bool(4.0 * med_rec[i, M_INV_RHO] < extent))
    if has_med_tex:
        # the walk multiplies throughput by the event medium's SOLID
        # albedo (media_events M_ALB); per-event texture evaluation
        # inside the walk is not worth kernel space — textured-media
        # scenes take the plain event path (correct, just slower)
        med_dense = [False] * len(med_dense)

    int_rows, int_kinds = [], []
    if any(med_dense):
        cand = ([(rec[i], k) for i, k in enumerate(kinds)]
                + [(dyn_rec[i],
                    "moving" if dyn_rec[i, R_INV_DT] != 0.0 else "sphere")
                   for i in range(n_dyn)]
                + [(box_rec[i], "box") for i in range(n_box)])
        # the walk is only sound when every segment from inside the
        # medium ends at a KNOWN surface at or before the medium's own
        # exit — i.e. a coincident boundary prim seals the volume (the
        # reference's subsurface pattern: glass shell + interior
        # medium, tests/test.rs:469-483). Without one, a no-scatter
        # window could extend past geometry the interior set can't see.
        for mi, (mk, dense) in enumerate(zip(med_kinds, med_dense)):
            if not dense:
                continue
            sealed = False
            R = med_rec[mi, M_ROT:M_ROT + 9].reshape(3, 3)
            off = med_rec[mi, M_OFF:M_OFF + 3]
            if mk == "msphere" and np.allclose(R, np.eye(3), atol=1e-6):
                cw = med_rec[mi, M_DATA:M_DATA + 3] + off
                r_m = float(np.sqrt(med_rec[mi, M_DATA + 3]))
                for row, k in cand:
                    if (k == "sphere"
                            and np.allclose(row[R_C0:R_C0 + 3], cw,
                                            atol=1e-3 * max(r_m, 1.0))
                            and abs(row[R_RADIUS] - r_m) < 1e-3 * r_m):
                        sealed = True
                        break
            med_dense[mi] = sealed
    if any(med_dense):
        for row, k in cand:
            plo, phi = _row_aabb(row, k)
            for dense, (mlo, mhi) in zip(med_dense, med_aabbs):
                if dense and (plo <= mhi).all() and (mlo <= phi).all():
                    int_rows.append(row)
                    int_kinds.append(k)
                    break
        if len(int_rows) > 24:
            # too many interior surfaces for the cheap loop to pay off
            int_rows, int_kinds = [], []
    int_rec = (np.stack(int_rows).astype(np.float32) if int_rows
               else np.zeros((1, REC), np.float32))
    med_kinds = tuple(zip(med_kinds,
                          med_dense if int_rows else [False] * len(
                              med_dense)))

    # group unrolled rects by world frame
    groups = {}
    for i, k in enumerate(kinds):
        if k != "rect":
            continue
        key = tuple(np.round(rec[i, R_KN:R_BN + 3], 5).tolist())
        groups.setdefault(key, []).append(i)
    rect_groups = tuple(tuple(g) for g in groups.values())
    if n_dyn or n_box:
        # columns cover the thin-path winner index space: dynamic
        # spheres then boxes (unrolled prims keep the fat select);
        # rows are the compact static field list (attr_fields)
        attr_fields = _attr_field_list(dyn_rec, box_rec, n_dyn, n_box)
        attr = _build_attr_table(dyn_rec, box_rec, n_dyn, n_box,
                                 attr_fields)
    else:
        attr_fields = ()
        attr = np.zeros((8, 128), np.int32)
    return (rec, tuple(kinds), rect_groups, dyn_rec, n_dyn, box_rec, n_box,
            sclus, n_sclus, bclus, n_bclus, med_rec, med_kinds,
            flags, img_packed, attr, attr_fields, int_rec,
            tuple(int_kinds))


def build_camera_record(cam) -> np.ndarray:
    cam = jax.device_get(cam)  # one batched pull (tunnel roundtrips)
    rec = np.zeros(CAMREC, np.float32)
    rec[C_ORIGIN:C_ORIGIN + 3] = np.asarray(cam.origin)
    rec[C_LL:C_LL + 3] = np.asarray(cam.lower_left)
    rec[C_HORIZ:C_HORIZ + 3] = np.asarray(cam.horizontal)
    rec[C_VERT:C_VERT + 3] = np.asarray(cam.vertical)
    rec[C_U:C_U + 3] = np.asarray(cam.u)
    rec[C_V:C_V + 3] = np.asarray(cam.v)
    rec[C_LENS_R] = float(cam.lens_radius)
    rec[C_TIME0] = float(cam.time0)
    rec[C_DTIME] = float(cam.time1) - float(cam.time0)
    return rec


def _uniform(shape):
    """U[0,1) f32 from the core PRNG (24 mantissa-bit resolution).

    prng_random_bits yields int32; a logical shift needs the uint32 view
    (an arithmetic shift would sign-extend and produce U[-0.5, 0.5)).
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(1.0 / (1 << 24)))


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _noise3(px, py, pz, seed):
    """Hash-gradient Perlin noise on scalar-triple lane tiles.

    The same formula as ops/perlin.noise (reference src/perlin.rs:58-97
    with hash gradients — see that module's docstring), restructured over
    (px, py, pz) component planes instead of a stacked [..., 3] axis,
    which is the layout the VPU wants. Shares `_gradient` with the XLA
    tier so the integer path is bit-identical across tiers.
    """
    f = jnp.float32
    fx, fy, fz = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
    ux, uy, uz = px - fx, py - fy, pz - fz
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    iz = fz.astype(jnp.int32)
    # Hermite smoothing (reference src/perlin.rs:39-41)
    sx = ux * ux * (f(3.0) - f(2.0) * ux)
    sy = uy * uy * (f(3.0) - f(2.0) * uy)
    sz = uz * uz * (f(3.0) - f(2.0) * uz)
    accum = jnp.zeros_like(px)
    for di in (0, 1):
        wu = sx if di else (f(1.0) - sx)
        for dj in (0, 1):
            wv = sy if dj else (f(1.0) - sy)
            for dk in (0, 1):
                ww = sz if dk else (f(1.0) - sz)
                gx, gy, gz = _gradient((ix + di) & 255, (iy + dj) & 255,
                                       (iz + dk) & 255, seed)
                dot = (gx * (ux - f(di)) + gy * (uy - f(dj))
                       + gz * (uz - f(dk)))
                accum = accum + wu * wv * ww * dot
    return accum


def _turb3(px, py, pz, seed, depth=7):
    """|Σ 0.5^k noise(2^k p)| (reference src/perlin.rs:99-109)."""
    f = jnp.float32
    accum = jnp.zeros_like(px)
    weight = 1.0
    qx, qy, qz = px, py, pz
    for _ in range(depth):
        accum = accum + f(weight) * _noise3(qx, qy, qz, seed)
        weight *= 0.5
        qx, qy, qz = qx * f(2.0), qy * f(2.0), qz * f(2.0)
    return jnp.abs(accum)


def _atan2(y, x):
    """atan2 via an odd minimax polynomial on [0, 1] (max err ~2e-7 rad).

    Mosaic has no arctan/arctan2/arcsin lowering, so the sphere-UV path
    builds them from octant reduction + polynomial. A ~1e-7 rad angle
    error moves u by ~2e-8 — far below half a texel at any realistic
    image width, so nearest-texel selection matches the XLA tier's
    jnp.arctan2 everywhere except samples within ~1e-5 texel of a texel
    boundary (statistically invisible at parity tolerances).
    """
    f = jnp.float32
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    t = jnp.minimum(ax, ay) / jnp.maximum(hi, f(1e-37))
    t2 = t * t
    # minimax odd series for atan(t), t in [0, 1]
    p = f(-0.0040540580)
    for c in (0.0218612288, -0.0559098861, 0.0964200441, -0.1390853351,
              0.1994653599, -0.3332985605, 0.9999993329):
        p = p * t2 + f(c)
    a = p * t
    a = jnp.where(ay > ax, f(math.pi / 2) - a, a)
    a = jnp.where(x < f(0.0), f(math.pi) - a, a)
    return jnp.where(y < f(0.0), -a, a)


def _asin(y):
    return _atan2(y, jnp.sqrt(jnp.maximum(jnp.float32(0.0),
                                          jnp.float32(1.0) - y * y)))


def _or_reduce(m):
    """Scalar union of an (S, L) int32 bitmask via a log-depth roll
    tree: one jnp.any-priced reduction answers up to 31 "does any lane
    need X" questions at once (cross-lane reduces cost ~250 ns each on
    v5e — more than a dozen member intersection tests — so the kernel
    batches every gate it can through this)."""
    s = m.shape[1] // 2
    while s:
        m = m | pltpu.roll(m, shift=s, axis=1)
        s //= 2
    s = m.shape[0] // 2
    while s:
        m = m | pltpu.roll(m, shift=s, axis=0)
        s //= 2
    return m[0, 0]


def _packed_need(pred, n, shape):
    """int32 scalar words w[k // 31] whose bit (k % 31) answers
    any-lane(pred(k)), for k in range(n) — ceil(n/31) reductions total."""
    words = []
    m = jnp.zeros(shape, jnp.int32)
    nbit = 0
    for k in range(n):
        m = m | (pred(k).astype(jnp.int32) << nbit)
        nbit += 1
        if nbit == 31 or k == n - 1:
            words.append(_or_reduce(m))
            m = jnp.zeros(shape, jnp.int32)
            nbit = 0
    return words


def _word_bit(words, k):
    """Bit k of the packed words as a scalar, k traced or static."""
    if isinstance(k, int):
        return (words[k // 31] >> (k % 31)) & 1
    b = words[-1] >> (k - 31 * (len(words) - 1))
    for j in reversed(range(len(words) - 1)):
        b = jnp.where(k < 31 * (j + 1), words[j] >> (k - 31 * j), b)
    return b & 1


def _image_fetch(img_ref, jrow, icol):
    """Exact per-lane 2D gather out[r, c] = img[jrow[r, c], icol[r, c]].

    Mosaic's only data-dependent moves are 8-deep sublane gathers and
    128-wide lane gathers (take_along_axis; wider lane gathers have no
    lowering), and two gathers do not compose — the second re-indexes
    the bindings of the first — so a (row, col) texel fetch cannot be
    built as rows-then-columns over the tile. Instead, iterate the 8
    destination sublanes with that row's indices broadcast
    sublane-uniform; then for each 8-row chunk of the image: resolve the
    column with 128-block lane gathers (operand is source-pure, select
    by the high index bits is destination-indexed), resolve the row with
    one sublane gather, and fold into the accumulator by row-chunk id.
    Cost is (rows/8)·(width/128) gather ops per destination sublane —
    ~10x a full bounce for a 512x1024 atlas, vs ~400x for the XLA-tier
    fallback this replaces.

    The chunk loop is runtime-gated: a lane tile is ~10 adjacent image
    rows, whose sphere hits span a narrow latitude band, so typically
    <10% of the atlas row-chunks are touched — the cond skips the other
    90%+ of the gather work (the dominant term).
    """
    n_rows, wpad = img_ref.shape
    n_rk, n_kc = n_rows // 8, wpad // 128
    S, L = jrow.shape
    n_oc = L // 128
    jlo, jhi = jrow & 7, jrow >> 3
    ilo, ihi = icol & 127, icol >> 7
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)

    def chunk_body(k, out):
        def active(_, out):
            chunk = img_ref[pl.ds(k * 8, 8), :]
            for r in range(S):
                def bc(a, r=r):
                    return jnp.broadcast_to(a[r:r + 1, :], (S, L))

                jlo_b, jhi_b = bc(jlo), bc(jhi)
                ilo_b, ihi_b = bc(ilo), bc(ihi)
                colres = jnp.zeros((S, L), jnp.int32)
                for kc in range(n_kc):
                    blk = chunk[:, 128 * kc:128 * (kc + 1)]
                    g = jnp.concatenate(
                        [jnp.take_along_axis(
                            blk, ilo_b[:, 128 * oc:128 * (oc + 1)], axis=1)
                         for oc in range(n_oc)], axis=1)
                    colres = jnp.where(ihi_b == kc, g, colres)
                rowres = jnp.take_along_axis(colres, jlo_b, axis=0)
                out = jnp.where((sub_iota == r) & (jhi_b == k), rowres, out)
            return out

        # zero-or-one-trip loop instead of lax.cond (see _clus_guard);
        # the chunk's need bit comes from one packed mask pass instead
        # of a per-chunk jnp.any (64 reduces → 3 for a 512-row atlas)
        return jax.lax.fori_loop(0, _word_bit(words, k), active, out)

    words = _packed_need(lambda k: jhi == k, n_rk, (S, L))
    return jax.lax.fori_loop(0, n_rk, chunk_body,
                             jnp.zeros((S, L), jnp.int32))


def _attr_gather(attr_ref, col, n_bands):
    """fields[f][s, l] = attr_ref[f, col[s, l]] — the thin hit path's
    attribute resolution.

    The table is transposed (fields on sublanes, primitives on lanes):
    for each destination sublane s, broadcasting that row's column
    indices sublane-uniform makes one 128-block take_along_axis fetch
    8 fields of every lane's winning primitive at once; a second pass
    redistributes field f to its own (8, LANES) array. Cost is
    n_bands·8·n_blocks gathers + n_bands·64 selects — a few µs for 3.4k
    primitives, INDEPENDENT of how many distinct winners the tile has
    (the property per-primitive select() carries lack: their cost is
    O(P) per bounce in vector ops and loop-carry traffic).
    """
    S, L = col.shape
    n_blocks = attr_ref.shape[1] // 128
    n_oc = L // 128
    clo, chi = col & 127, col >> 7
    # winners within one tile step are spatially clustered, so most
    # 128-prim blocks have no takers on most steps: skip them with a
    # zero-trip fori per block, all need bits from ONE packed reduce
    # shared by every band/sublane
    need = _packed_need(lambda kc: chi == kc, n_blocks, col.shape)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    fields = [jnp.zeros((S, L), jnp.int32) for _ in range(8 * n_bands)]
    for band in range(n_bands):
        for s in range(S):
            clo_b = jnp.broadcast_to(clo[s:s + 1, :], (S, L))
            chi_b = jnp.broadcast_to(chi[s:s + 1, :], (S, L))
            g = jnp.zeros((S, L), jnp.int32)
            for kc in range(n_blocks):
                def fetch(_, g, kc=kc):
                    blk = attr_ref[band * 8:(band + 1) * 8,
                                   128 * kc:128 * (kc + 1)]
                    gk = jnp.concatenate(
                        [jnp.take_along_axis(
                            blk, clo_b[:, 128 * oc:128 * (oc + 1)], axis=1)
                         for oc in range(n_oc)], axis=1)
                    return jnp.where(chi_b == kc, gk, g)

                g = jax.lax.fori_loop(0, _word_bit(need, kc), fetch, g)
            for fz in range(8):
                fields[band * 8 + fz] = jnp.where(
                    sub_iota == s,
                    jnp.broadcast_to(g[fz:fz + 1, :], (S, L)),
                    fields[band * 8 + fz])
    return [jax.lax.bitcast_convert_type(x, jnp.float32) for x in fields]


def _make_kernel(kinds, rect_groups, n_dyn, n_box, n_sclus, n_bclus,
                 med_kinds, flags, background, nx, ny, rr_depth=None,
                 perlin_seed=0, block=None, stats=False,
                 explicit_pix=False, int_kinds=(), attr_fields=(),
                 kpix=1, dda=False):
    """Build the megakernel body for a static scene structure.

    spp / max_depth arrive as runtime scalars (params_ref = [seed, spp,
    max_depth]) so one compile serves every sample count.

    stats=True adds four output rows of per-lane diagnostics counters
    (wavefront steps, sphere member tests, box member tests, busy steps)
    used by tools/kernel_stats.py AND by the production cost-balance
    probe (_cost_permutation reads the busy row); the counters ride the
    loop carries, so timings taken in stats mode are NOT representative.
    dda=True (requires stats) adds a FIFTH row — any-lane-crossed box
    tests, the grid-DDA visit probe — which costs a cross-lane reduce
    per box member test (~a dozen member tests each, CLAUDE.md), so it
    is kept OFF the balance probe and enabled only by kernel_stats.
    """
    assert stats or not dda, "dda probe requires stats mode"
    (has_checker, has_metal, has_diel, has_noise, has_image,
     dyn_moving, compat_uv, emis_tex, uv_carry, img_flip,
     med_tex) = flags
    assert kpix == 1 or explicit_pix, \
        "kpix > 1 requires an explicit per-lane pixel table"
    if ABLATE:  # timing diagnostics only (see ABLATE above)
        if "noise" in ABLATE:
            has_noise = False
        if "image" in ABLATE:
            has_image = False
        if "media" in ABLATE:
            med_kinds = ()
        if "walk" in ABLATE:
            int_kinds = ()
        if "members" in ABLATE:
            n_dyn = n_box = 0
        if "static" in ABLATE:
            # compile out the unrolled static prim loops (cornell-class
            # scenes: every ray misses, so at depth 1 the removed cost is
            # exactly the static closest-hit section — used by
            # tools/kernel_stats.py --mfu for member-fraction attribution)
            kinds = ()
            rect_groups = ()
    f = jnp.float32

    # optional per-prim record fields threaded through the hit-selection
    # state beyond the 12 core entries, in this order
    extra_fields = []
    if has_checker:
        extra_fields += [R_ALB_ODD, R_ALB_ODD + 1, R_ALB_ODD + 2, R_CHECKER]
    if has_noise:
        extra_fields += [R_NOISE, R_NSCALE]
    if has_image:
        extra_fields += [R_IMG, R_IMG_BASE, R_IMG_H, R_IMG_W]
    # computed (non-record) carries appended after the record fields:
    # winner flip (pre-flip image normals) and selection-time UV
    # (image-on-rect world-frame projections / medium-image u=v=0)
    n_special = (1 if img_flip else 0) + (3 if uv_carry else 0)
    SPECIAL_BASE = 12 + len(extra_fields)

    def kernel(rec_ref, dyn_ref, box_ref, sclus_ref, bclus_ref, med_ref,
               cam_ref, params_ref, img_ref, attr_ref, int_ref, *rest):
        if explicit_pix:
            pix_ref, out_ref = rest
        else:
            (out_ref,) = rest
        pid = pl.program_id(0)
        pltpu.prng_seed(params_ref[0], pid)
        spp_v = params_ref[1].astype(jnp.float32)
        depth_v = params_ref[2].astype(jnp.float32)
        grid_base = params_ref[3]  # first tile id (multi-device splits)

        # lane → pixel mapping (row 0 of the image = top scanline,
        # reference tests/test.rs:62-64 row order handled via j flip)
        row = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)

        def _pix_rowcol(pixf):
            """Exact pixel→(col, row) for integer-valued f32 pixf < 2^24.

            The raw floor((pix+0.5)·(1/nx)) reciprocal-multiply misreads
            hundreds of rows at 4K-scale images (measured: 834 bad
            indices at 3840×2160). pixf and jr·nx are integers < 2^24
            (exact in f32), so the remainder is exact and a ±1 row fixup
            makes the division exact (quotient error < 1 for nx ≥ 8:
            ≲2 ulp on a quotient ≤ 2^21). render_pallas guards
            nx·ny ≤ 2^24."""
            jr = jnp.floor((pixf + f(0.5)) * f(1.0 / nx))
            ic = pixf - jr * f(nx)
            jr = jnp.where(ic < f(0.0), jr - f(1.0), jr)
            jr = jnp.where(ic >= f(nx), jr + f(1.0), jr)
            return pixf - jr * f(nx), jr

        def _safe_inv(dc):
            """Safe reciprocal direction for slab tests: exact-zero
            components get a huge signed inverse so parallel rays outside
            a slab miss and inside-slab rays pass (reference
            src/aabb.rs:31-44 relies on IEEE inf; Mosaic NaN comparisons
            make 0·inf unsafe, hence the clamp). Shared by the main
            bounce's box loop and the dense-medium walk."""
            sgn = jnp.where(dc >= f(0.0), f(1e30), f(-1e30))
            return jnp.where(jnp.abs(dc) < f(1e-30), sgn, f(1.0) / dc)
        icol_ks = jflip_ks = None
        if explicit_pix:
            # cost-balanced scheduling: the host hands each lane its
            # pixel(s) directly (tiles grouped by measured path cost with
            # a spatial tie-break — see render_pallas). Index n_pix is the
            # dummy slot for padding lanes; render coordinates clamp to
            # the last real pixel, the host scatter drops the slot.
            # With kpix > 1 the table carries kpix (SUB, LANES) banks per
            # tile; a lane renders bank b once scnt reaches b·spp.
            pix_all = pix_ref[...]
            icol_ks, jflip_ks = [], []
            for k in range(kpix):
                pixk = pix_all[k * SUB:(k + 1) * SUB]
                pixf = jnp.minimum(pixk, nx * ny - 1).astype(f)
                ic, jr = _pix_rowcol(pixf)
                icol_ks.append(ic)
                jflip_ks.append(f(ny - 1) - jr)
            icol, jrow = icol_ks[0], f(ny - 1) - jflip_ks[0]
        elif block is not None:
            # 2D pixel-block tiles (scenes with dynamic cluster loops):
            # a tile covers a compact BX×BY pixel block instead of a
            # TILE-long scanline strip, so the lane-coherent cluster
            # guards see spatially coherent primary rays (and the
            # locality-correlated early bounces) and actually skip.
            # Edge lanes clamp onto the last row/column (their extra
            # samples are cropped by the host assembly).
            bxw, byh = block
            gx = -(-nx // bxw)
            tid = grid_base + pid
            by_t = tid // gx
            bx_t = tid - by_t * gx
            lane = row * LANES + col
            sh = bxw.bit_length() - 1      # BX is a power of two
            x_i = jnp.minimum(bx_t * bxw + (lane & (bxw - 1)), nx - 1)
            y_i = jnp.minimum(by_t * byh + (lane >> sh), ny - 1)
            icol = x_i.astype(f)
            jrow = y_i.astype(f)
        else:
            pix = (grid_base + pid) * TILE + row * LANES + col
            pix = jnp.minimum(pix, nx * ny - 1)
            icol, jrow = _pix_rowcol(pix.astype(f))
        jflip = f(ny - 1) - jrow

        def cs(i):  # camera scalar
            return cam_ref[i]

        ox0, oy0, oz0 = cs(C_ORIGIN), cs(C_ORIGIN + 1), cs(C_ORIGIN + 2)
        llx, lly, llz = cs(C_LL), cs(C_LL + 1), cs(C_LL + 2)
        hx, hy, hz = cs(C_HORIZ), cs(C_HORIZ + 1), cs(C_HORIZ + 2)
        vx, vy, vz = cs(C_VERT), cs(C_VERT + 1), cs(C_VERT + 2)
        cux, cuy, cuz = cs(C_U), cs(C_U + 1), cs(C_U + 2)
        cvx, cvy, cvz = cs(C_V), cs(C_V + 1), cs(C_V + 2)
        lens_r, t0c, dtc = cs(C_LENS_R), cs(C_TIME0), cs(C_DTIME)

        def media_events(ox, oy, oz, dx, dy, dz, a_dd, inv_a, t_cap,
                         skip):
            """Nearest ConstantMedium scatter event on [T_MIN, t_cap]:
            (t_med, albedo rgb, dense flag of the winning medium,
            [texture fields when med_tex]). Shared by the main bounce
            and the dense-medium walk (med_tex scenes never walk)."""
            d_len = jnp.sqrt(a_dd)
            inv_dlen = f(1.0) / d_len
            t_med = jnp.full((SUB, LANES), f(BIG))
            mar = mag = mab = mdn = jnp.zeros((SUB, LANES), f)
            # winning medium's albedo-texture fields (Isotropic is
            # texture-generic, reference src/material.rs:153-173)
            mex = [jnp.zeros((SUB, LANES), f)
                   for _ in range(10)] if med_tex else []
            for i, (mk, dense_i) in enumerate(med_kinds):
                def mr(k):
                    return med_ref[i, k]

                # world→object (reference src/traslate.rs:18 +
                # src/rotate.rs:87-97, hoisted into R₋, offset)
                wx = ox - mr(M_OFF)
                wy = oy - mr(M_OFF + 1)
                wz = oz - mr(M_OFF + 2)
                o0x = mr(M_ROT) * wx + mr(M_ROT + 1) * wy \
                    + mr(M_ROT + 2) * wz
                o0y = mr(M_ROT + 3) * wx + mr(M_ROT + 4) * wy \
                    + mr(M_ROT + 5) * wz
                o0z = mr(M_ROT + 6) * wx + mr(M_ROT + 7) * wy \
                    + mr(M_ROT + 8) * wz
                d0x = mr(M_ROT) * dx + mr(M_ROT + 1) * dy \
                    + mr(M_ROT + 2) * dz
                d0y = mr(M_ROT + 3) * dx + mr(M_ROT + 4) * dy \
                    + mr(M_ROT + 5) * dz
                d0z = mr(M_ROT + 6) * dx + mr(M_ROT + 7) * dy \
                    + mr(M_ROT + 8) * dz

                if mk == "msphere":
                    ocx = o0x - mr(M_DATA)
                    ocy = o0y - mr(M_DATA + 1)
                    ocz = o0z - mr(M_DATA + 2)
                    bq = _dot3(ocx, ocy, ocz, d0x, d0y, d0z)
                    cq = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) \
                        - mr(M_DATA + 3)
                    disc = bq * bq - a_dd * cq
                    mok = disc > f(0.0)
                    sq = jnp.sqrt(jnp.where(mok, disc, f(1.0)))
                    enter = (-bq - sq) * inv_a
                    exit_ = (-bq + sq) * inv_a
                else:
                    tiny = f(1e-30)
                    sx = jnp.where(jnp.abs(d0x) < tiny, tiny, d0x)
                    sy = jnp.where(jnp.abs(d0y) < tiny, tiny, d0y)
                    sz = jnp.where(jnp.abs(d0z) < tiny, tiny, d0z)
                    ax0 = (mr(M_DATA) - o0x) / sx
                    ax1 = (mr(M_DATA + 3) - o0x) / sx
                    ay0 = (mr(M_DATA + 1) - o0y) / sy
                    ay1 = (mr(M_DATA + 4) - o0y) / sy
                    az0 = (mr(M_DATA + 2) - o0z) / sz
                    az1 = (mr(M_DATA + 5) - o0z) / sz
                    enter = jnp.maximum(
                        jnp.maximum(jnp.minimum(ax0, ax1),
                                    jnp.minimum(ay0, ay1)),
                        jnp.minimum(az0, az1))
                    exit_ = jnp.minimum(
                        jnp.minimum(jnp.maximum(ax0, ax1),
                                    jnp.maximum(ay0, ay1)),
                        jnp.maximum(az0, az1))
                    mok = enter < exit_

                enter = jnp.maximum(enter, f(T_MIN))
                exit_ = jnp.minimum(exit_, t_cap)
                mok = mok & (enter < exit_)
                u_m = _uniform((SUB, LANES))
                flight = -mr(M_INV_RHO) * jnp.log(
                    jnp.maximum(u_m, f(1e-37)))
                dist_inside = (exit_ - enter) * d_len
                scat = (mok.astype(f)
                        * (flight < dist_inside).astype(f)) > f(0.0)
                scat = scat & (skip < f(0.5))
                t_i = jnp.where(scat, enter + flight * inv_dlen,
                                f(BIG))
                mbetter = t_i < t_med
                t_med = jnp.where(mbetter, t_i, t_med)
                mar = jnp.where(mbetter, mr(M_ALB), mar)
                mag = jnp.where(mbetter, mr(M_ALB + 1), mag)
                mab = jnp.where(mbetter, mr(M_ALB + 2), mab)
                mdn = jnp.where(mbetter, f(1.0 if dense_i else 0.0), mdn)
                if med_tex:
                    for j, fld in enumerate((M_ALB_ODD, M_ALB_ODD + 1,
                                             M_ALB_ODD + 2, M_CHK,
                                             M_NOISE, M_NSCALE, M_IMG,
                                             M_IMG_BASE, M_IMG_H,
                                             M_IMG_W)):
                        mex[j] = jnp.where(mbetter, mr(fld), mex[j])
            return t_med, mar, mag, mab, mdn, mex

        # ---- persistent wavefront over the sample budget ----
        # One lane = one pixel. Instead of tracing sample k of every lane
        # to termination before sample k+1 (utilization = mean/max path
        # length, ~30% in closed scenes), a lane whose path dies banks its
        # radiance and immediately regenerates the next camera ray. Every
        # iteration runs at ~full occupancy until the whole tile's spp
        # budget drains; only the final tail is divergent.
        n_extra = (1 + 3 * (kpix - 1)) if kpix > 1 else 0

        def step(carry):
            (ox, oy, oz, dx, dy, dz, time, thr_r, thr_g, thr_b,
             rad_r, rad_g, rad_b, alive, bcnt, scnt,
             acc_r, acc_g, acc_b, skip_med) = carry[:20]
            if kpix > 1:
                bank = carry[20]
                accs = [[acc_r, acc_g, acc_b]]
                for k in range(1, kpix):
                    accs.append(list(carry[21 + 3 * (k - 1):
                                           21 + 3 * k]))
            if stats:
                srows = carry[20 + n_extra:]
                s_steps, s_mem_s, s_mem_b, s_busy = srows[:4]
                s_hit_b = srows[4] if dda else None
                s_steps = s_steps + f(1.0)

            # -- regenerate dead lanes that still owe samples
            # (reference src/camera.rs:53-67 + jitter tests/test.rs:
            # 66-68) --
            regen = (alive == f(0.0)) & (scnt < spp_v * f(kpix))
            if kpix > 1:
                # current pixel of each lane: bank advanced as samples
                # complete (monotone), so chained wheres resolve it
                icol_b, jflip_b = icol_ks[0], jflip_ks[0]
                for k in range(1, kpix):
                    sw = bank > f(k - 0.5)
                    icol_b = jnp.where(sw, icol_ks[k], icol_b)
                    jflip_b = jnp.where(sw, jflip_ks[k], jflip_b)
            else:
                icol_b, jflip_b = icol, jflip
            u0, u1 = _uniform((SUB, LANES)), _uniform((SUB, LANES))
            s = (icol_b + u0) * f(1.0 / nx)
            t = (jflip_b + u1) * f(1.0 / ny)
            ud0, ud1 = _uniform((SUB, LANES)), _uniform((SUB, LANES))
            rdr = jnp.sqrt(ud0)
            phi = f(2.0 * math.pi) * ud1
            rdx = lens_r * rdr * jnp.cos(phi)
            rdy = lens_r * rdr * jnp.sin(phi)
            cox = ox0 + rdx * cux + rdy * cvx
            coy = oy0 + rdx * cuy + rdy * cvy
            coz = oz0 + rdx * cuz + rdy * cvz
            ox = jnp.where(regen, cox, ox)
            oy = jnp.where(regen, coy, oy)
            oz = jnp.where(regen, coz, oz)
            dx = jnp.where(regen, llx + s * hx + t * vx - cox, dx)
            dy = jnp.where(regen, lly + s * hy + t * vy - coy, dy)
            dz = jnp.where(regen, llz + s * hz + t * vz - coz, dz)
            time = jnp.where(regen,
                             t0c + _uniform((SUB, LANES)) * dtc, time)
            one = f(1.0)
            thr_r = jnp.where(regen, one, thr_r)
            thr_g = jnp.where(regen, one, thr_g)
            thr_b = jnp.where(regen, one, thr_b)
            rad_r = jnp.where(regen, f(0.0), rad_r)
            rad_g = jnp.where(regen, f(0.0), rad_g)
            rad_b = jnp.where(regen, f(0.0), rad_b)
            bcnt = jnp.where(regen, f(0.0), bcnt)
            alive = jnp.where(regen, one, alive)
            skip_med = jnp.where(regen, f(0.0), skip_med)
            if stats:
                # per-lane occupancy: steps this lane did useful work
                s_busy = s_busy + alive

            # ---- closest hit: unrolled prim loop over SMEM scalars ----
            t_best = jnp.full((SUB, LANES), f(BIG))
            nx_b = ny_b = nz_b = jnp.zeros((SUB, LANES), f)
            mat_b = par_b = jnp.zeros((SUB, LANES), f)
            emr = emg = emb = jnp.zeros((SUB, LANES), f)
            alr = alg = alb_ = jnp.zeros((SUB, LANES), f)

            a_dd = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = f(1.0) / a_dd

            def select(r, better, t_p, nxx, nyy, nzz, st, uvw=None):
                (t_best, nx_b, ny_b, nz_b, mat_b, par_b,
                 emr, emg, emb, alr, alg, alb_) = st[:12]
                flip = r(R_FLIP)
                t_best = jnp.where(better, t_p, t_best)
                nx_b = jnp.where(better, nxx * flip, nx_b)
                ny_b = jnp.where(better, nyy * flip, ny_b)
                nz_b = jnp.where(better, nzz * flip, nz_b)
                mat_b = jnp.where(better, r(R_MAT), mat_b)
                if has_metal or has_diel:
                    par_b = jnp.where(better, r(R_PARAM), par_b)
                emr = jnp.where(better, r(R_EMIT), emr)
                emg = jnp.where(better, r(R_EMIT + 1), emg)
                emb = jnp.where(better, r(R_EMIT + 2), emb)
                alr = jnp.where(better, r(R_ALB_EVEN), alr)
                alg = jnp.where(better, r(R_ALB_EVEN + 1), alg)
                alb_ = jnp.where(better, r(R_ALB_EVEN + 2), alb_)
                out = [t_best, nx_b, ny_b, nz_b, mat_b, par_b,
                       emr, emg, emb, alr, alg, alb_]
                out += [jnp.where(better, r(fid), st[12 + i])
                        for i, fid in enumerate(extra_fields)]
                sp = SPECIAL_BASE
                if img_flip:
                    out.append(jnp.where(better, flip, st[sp]))
                    sp += 1
                if uv_carry:
                    # rect winners carry selection-time UV (the frame
                    # scalars are in SMEM here, never post-loop); sphere
                    # winners leave uvf=0 → the image block derives UV
                    # from the normal
                    if uvw is None:
                        uu_p = vv_p = uvf_p = f(0.0)
                    else:
                        uu_p, vv_p, uvf_p = uvw
                    out.append(jnp.where(better, uu_p, st[sp]))
                    out.append(jnp.where(better, vv_p, st[sp + 1]))
                    out.append(jnp.where(better, uvf_p, st[sp + 2]))
                return out

            st = [t_best, nx_b, ny_b, nz_b, mat_b, par_b,
                  emr, emg, emb, alr, alg, alb_]
            st += [jnp.zeros((SUB, LANES), f)
                   for _ in range(len(extra_fields) + n_special)]

            # spheres / moving spheres (reference src/sphere.rs:37-77,
            # :115-118)
            for p, kind in enumerate(kinds):
                if kind == "rect":
                    continue

                def r(i, p=p):
                    return rec_ref[p, i]

                if kind == "moving":
                    frac = (time - r(R_T0)) * r(R_INV_DT)
                    cx = r(R_C0) + frac * r(R_DC)
                    cy = r(R_C0 + 1) + frac * r(R_DC + 1)
                    cz = r(R_C0 + 2) + frac * r(R_DC + 2)
                else:
                    cx, cy, cz = r(R_C0), r(R_C0 + 1), r(R_C0 + 2)
                ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
                t_best = st[0]
                bq = _dot3(ocx, ocy, ocz, dx, dy, dz)
                cq = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - r(R_R2)
                disc = bq * bq - a_dd * cq
                pos = disc > f(0.0)
                sq = jnp.sqrt(jnp.where(pos, disc, f(1.0)))
                t_near = (-bq - sq) * inv_a
                t_far = (-bq + sq) * inv_a
                near_ok = pos & (t_near > f(T_MIN)) & (t_near < t_best)
                far_ok = pos & (t_far > f(T_MIN)) & (t_far < t_best)
                t_p = jnp.where(near_ok, t_near,
                                jnp.where(far_ok, t_far, f(BIG)))
                better = t_p < t_best
                inv_r = f(1.0) / r(R_RADIUS)
                nxx = (ocx + t_p * dx) * inv_r
                nyy = (ocy + t_p * dy) * inv_r
                nzz = (ocz + t_p * dz) * inv_r
                st = select(r, better, t_p, nxx, nyy, nzz, st)

            # rects, grouped by world frame: the six ray·frame dot
            # products amortize over every rect in the frame
            # (reference src/rect.rs:39-69; x = (o+td)·an expands to
            # o·an + t·(d·an))
            for group in rect_groups:
                def r0(i, p=group[0]):
                    return rec_ref[p, i]

                knx, kny, knz = r0(R_KN), r0(R_KN + 1), r0(R_KN + 2)
                d_kn = _dot3(dx, dy, dz, knx, kny, knz)
                o_kn = _dot3(ox, oy, oz, knx, kny, knz)
                nonpar = d_kn != f(0.0)
                inv_kn = f(1.0) / jnp.where(nonpar, d_kn, f(1.0))
                o_an = _dot3(ox, oy, oz, r0(R_AN), r0(R_AN + 1),
                             r0(R_AN + 2))
                d_an = _dot3(dx, dy, dz, r0(R_AN), r0(R_AN + 1),
                             r0(R_AN + 2))
                o_bn = _dot3(ox, oy, oz, r0(R_BN), r0(R_BN + 1),
                             r0(R_BN + 2))
                d_bn = _dot3(dx, dy, dz, r0(R_BN), r0(R_BN + 1),
                             r0(R_BN + 2))
                nxx = jnp.full((SUB, LANES), knx)
                nyy = jnp.full((SUB, LANES), kny)
                nzz = jnp.full((SUB, LANES), knz)

                for p in group:
                    def r(i, p=p):
                        return rec_ref[p, i]

                    t_best = st[0]
                    t_p = (r(R_KOFF) - o_kn) * inv_kn
                    xa = o_an + t_p * d_an - r(R_AOFF)
                    yb = o_bn + t_p * d_bn - r(R_BOFF)
                    ok = (nonpar & (t_p > f(T_MIN)) & (t_p < t_best)
                          & (xa >= r(R_A0)) & (xa <= r(R_A1))
                          & (yb >= r(R_B0)) & (yb <= r(R_B1)))
                    t_p = jnp.where(ok, t_p, f(BIG))
                    uvw = None
                    if uv_carry:
                        # world-frame UV exactly like ops/intersect.py
                        # hit_attributes (reference src/rect.rs:53-60);
                        # the reciprocals are SMEM scalar math
                        inv_wa = f(1.0) / (r(R_A1) - r(R_A0))
                        inv_wb = f(1.0) / (r(R_B1) - r(R_B0))
                        uvw = ((xa - r(R_A0)) * inv_wa,
                               (yb - r(R_B0)) * inv_wb, r(R_IMG))
                    st = select(r, ok, t_p, nxx, nyy, nzz, st, uvw=uvw)

            if n_dyn or n_box:
                inv_dx, inv_dy, inv_dz = (_safe_inv(dx), _safe_inv(dy),
                                          _safe_inv(dz))

                def _slab(lo0, lo1, lo2, hi0, hi1, hi2):
                    t0 = (lo0 - ox) * inv_dx
                    t1 = (hi0 - ox) * inv_dx
                    tmn = jnp.minimum(t0, t1)
                    tmx = jnp.maximum(t0, t1)
                    t0 = (lo1 - oy) * inv_dy
                    t1 = (hi1 - oy) * inv_dy
                    tmn = jnp.maximum(tmn, jnp.minimum(t0, t1))
                    tmx = jnp.minimum(tmx, jnp.maximum(t0, t1))
                    t0 = (lo2 - oz) * inv_dz
                    t1 = (hi2 - oz) * inv_dz
                    tmn = jnp.maximum(tmn, jnp.minimum(t0, t1))
                    tmx = jnp.minimum(tmx, jnp.maximum(t0, t1))
                    return tmn, tmx

                def _clus_guard(clus_ref, c, st, inner):
                    # skip a whole leaf when no live lane's ray crosses
                    # its AABB closer than that lane's current best hit.
                    # The skip is a zero-trip-count fori_loop, not a
                    # lax.cond: cond would thread the full ~20-array lane
                    # state through both branches, which Mosaic
                    # materializes as VMEM copies that cost more than the
                    # member loop it skips; an empty dynamic loop is one
                    # scalar compare
                    lo0, lo1, lo2 = (clus_ref[c, 0], clus_ref[c, 1],
                                     clus_ref[c, 2])
                    hi0, hi1, hi2 = (clus_ref[c, 3], clus_ref[c, 4],
                                     clus_ref[c, 5])
                    start = clus_ref[c, 6].astype(jnp.int32)
                    cnt = clus_ref[c, 7].astype(jnp.int32)
                    tmn, tmx = _slab(lo0, lo1, lo2, hi0, hi1, hi2)
                    cross = ((tmx > jnp.maximum(tmn, f(T_MIN)))
                             & (tmn < st[0]) & (alive > f(0.0)))
                    n_iter = jnp.where(jnp.any(cross), cnt, 0)
                    return jax.lax.fori_loop(start, start + n_iter,
                                             inner, tuple(st))

                def _culled_loop(clus_ref, counts, member_body, thin0,
                                 n_mem, leaf_fn=None):
                    # dispatch a dynamic member loop under the configured
                    # cull strategy (see CULL above). leaf_fn(c, bit, st),
                    # when given, replaces the wide path's generic
                    # per-leaf member fori — the grid strip pass uses it
                    # to hoist per-strip work outside its member loop
                    n_leaf, n_sup = counts[:2]

                    def leaf_body(c, st2):
                        return _clus_guard(clus_ref, c, st2, member_body)

                    if CULL == "flat" or n_leaf == 0:
                        return jax.lax.fori_loop(0, n_mem, member_body,
                                                 thin0)
                    if CULL == "wide":
                        # one mask pass over every leaf (cross-lane
                        # reduces amortized 31:1), then statically
                        # unrolled zero-trip member loops keyed on the
                        # scalar bits. The masks use the entry t_b (no
                        # mid-loop tightening — measured immaterial next
                        # to the reduce savings). The whole pass sits
                        # behind a root-AABB gate: medium-walk steps and
                        # sky tiles skip the table for one slab + one
                        # reduce (the root bounds fold from the super
                        # rows on the scalar unit, no host change).
                        sup_rows = list(range(n_leaf, n_leaf + n_sup)
                                        if n_sup else range(n_leaf))
                        rb = [clus_ref[sup_rows[0], c] for c in range(6)]
                        for r_ in sup_rows[1:]:
                            for c in range(3):
                                rb[c] = jnp.minimum(rb[c], clus_ref[r_, c])
                                rb[3 + c] = jnp.maximum(rb[3 + c],
                                                        clus_ref[r_, 3 + c])
                        tmn_r, tmx_r = _slab(rb[0], rb[1], rb[2],
                                             rb[3], rb[4], rb[5])
                        root_cross = ((tmx_r > jnp.maximum(tmn_r,
                                                           f(T_MIN)))
                                      & (tmn_r < thin0[0])
                                      & (alive > f(0.0)))

                        def table_pass(_, st2):
                            t_b0 = st2[0]

                            def leaf_cross(k):
                                tmn, tmx = _slab(clus_ref[k, 0],
                                                 clus_ref[k, 1],
                                                 clus_ref[k, 2],
                                                 clus_ref[k, 3],
                                                 clus_ref[k, 4],
                                                 clus_ref[k, 5])
                                return ((tmx > jnp.maximum(tmn, f(T_MIN)))
                                        & (tmn < t_b0)
                                        & (alive > f(0.0)))

                            words = _packed_need(leaf_cross, n_leaf,
                                                 (SUB, LANES))

                            # ONE dynamic loop over leaves (bit extract
                            # handles a traced index): statically
                            # unrolling a fori per leaf costs a Mosaic
                            # loop boundary each — measured ~60% of a
                            # coherent step's time on final_scene
                            def leaf_body(c, st3):
                                b = _word_bit(words, c)
                                if leaf_fn is not None:
                                    return leaf_fn(c, b, tuple(st3))
                                start = clus_ref[c, 6].astype(jnp.int32)
                                cnt = clus_ref[c, 7].astype(jnp.int32)
                                return jax.lax.fori_loop(
                                    start,
                                    start + jnp.where(b > 0, cnt, 0),
                                    member_body, tuple(st3))

                            return jax.lax.fori_loop(0, n_leaf,
                                                     leaf_body, st2)

                        return jax.lax.fori_loop(
                            0, jnp.any(root_cross).astype(jnp.int32),
                            table_pass, tuple(thin0))
                    if CULL == "leaf" or n_sup == 0:
                        return jax.lax.fori_loop(0, n_leaf, leaf_body,
                                                 thin0)
                    if CULL == "sup":
                        # guard at the super AABB only; a crossed super
                        # runs its contiguous member range unguarded
                        # (leaves tile members in order, so the range is
                        # first leaf's start .. last leaf's start+count)
                        def sup_body(s_, st2):
                            row = n_leaf + s_
                            l0 = clus_ref[row, 6].astype(jnp.int32)
                            lc = clus_ref[row, 7].astype(jnp.int32)
                            m0 = clus_ref[l0, 6].astype(jnp.int32)
                            m1 = (clus_ref[l0 + lc - 1, 6].astype(jnp.int32)
                                  + clus_ref[l0 + lc - 1, 7]
                                  .astype(jnp.int32))
                            tmn, tmx = _slab(
                                clus_ref[row, 0], clus_ref[row, 1],
                                clus_ref[row, 2], clus_ref[row, 3],
                                clus_ref[row, 4], clus_ref[row, 5])
                            cross = ((tmx > jnp.maximum(tmn, f(T_MIN)))
                                     & (tmn < st2[0]) & (alive > f(0.0)))
                            n_iter = jnp.where(jnp.any(cross), m1 - m0, 0)
                            return jax.lax.fori_loop(m0, m0 + n_iter,
                                                     member_body,
                                                     tuple(st2))

                        return jax.lax.fori_loop(0, n_sup, sup_body, thin0)

                    # "two": super guards over leaf guards
                    def sup2_body(s_, st2):
                        return _clus_guard(clus_ref, n_leaf + s_, st2,
                                           leaf_body)

                    return jax.lax.fori_loop(0, n_sup, sup2_body, thin0)

            if n_dyn or n_box:
                # ---- THIN dynamic hit pass. The member loops carry only
                # (t, winner-index): measured on v5e, a fat loop carrying
                # the full ~20-array select state costs ~250 ns/iteration
                # (loop-boundary register traffic) vs ~15 ns thin, and at
                # final_scene's 1406 dynamic prims that difference IS the
                # frame time. Winner attributes resolve afterwards in one
                # transposed VMEM gather (_attr_gather) whose cost does
                # not depend on prim count or winner spread. ----
                t_thin = st[0]
                widx = jnp.full((SUB, LANES), f(-1.0))

            if n_box:
                # merged axis-aligned cubes (reference src/cube.rs:20-74):
                # one slab test replaces six rect tests; entry face when
                # beyond T_MIN else exit face (face normal reconstructed
                # in the attribute pass). Boxes run BEFORE the spheres:
                # final_scene's ground boxes terminate most rays close,
                # and the wide cull's sphere masks use the running t_b —
                # box-first measured sphere member tests 75% → far less
                def box_thin(p, st2):
                    t_b, wi = st2[:2]

                    def r(i):
                        return box_ref[p, i]

                    tmn, tmx = _slab(r(R_C0), r(R_C0 + 1), r(R_C0 + 2),
                                     r(R_DC), r(R_DC + 1), r(R_DC + 2))
                    t_p = jnp.where(tmn > f(T_MIN), tmn, tmx)
                    ok = (tmx > tmn) & (t_p > f(T_MIN)) & (t_p < t_b)
                    st_stats = ()
                    if stats:
                        st_stats = (st2[2] + f(1.0),)
                        if dda:
                            # DDA probe (docs/DESIGN.md): would a
                            # per-CELL gate — any-lane ray-crosses-THIS-
                            # member's-AABB within its live t window,
                            # i.e. exactly the visit set of a tile-
                            # coherent grid DDA — have run this member
                            # test anyway? (one cross-lane reduce per
                            # member: kernel_stats-only, see docstring)
                            cross = ((tmx > jnp.maximum(tmn, f(T_MIN)))
                                     & (tmn < t_b) & (alive > f(0.0)))
                            hit = jnp.max(jnp.where(cross, f(1.0),
                                                    f(0.0)))
                            st_stats = st_stats + (st2[3] + hit,)
                    return (jnp.where(ok, t_p, t_b),
                            jnp.where(ok, f(n_dyn) + p.astype(f), wi)) \
                        + st_stats

                thin1 = (t_thin, widx) \
                    + (((s_mem_b,) + ((s_hit_b,) if dda else ()))
                       if stats else ())
                grid_spec = n_bclus[2:] if len(n_bclus) == 4 else None
                strip_leaf = None
                if grid_spec is not None and CULL == "wide":
                    # ---- grid strip pass (regular NI×NJ ground-box
                    # grid, _grid_cluster_rows): the shared y_lo plane
                    # is hoisted per step and the x-slab per strip;
                    # each member pays only its y_hi plane, its exact
                    # z entry, an incremental z exit (one shared f32
                    # pitch, host-verified), and the interval fold —
                    # ~2/3 of the generic slab test's vector ops on
                    # final_scene's dominant member population. The
                    # hoisted planes reuse the members' own bit
                    # patterns (leaf lo_x/hi_x == member lo_x/hi_x,
                    # host-verified), so the attribute resolve's exact
                    # t-match face classification is unchanged; an
                    # inexact incremental z EXIT can only win for
                    # inside-the-box starts, where the z face is the
                    # classification fallthrough anyway. ----
                    ylo_g = box_ref[0, R_C0 + 1]
                    w_g = box_ref[0, R_DC + 2] - box_ref[0, R_C0 + 2]
                    t_ylo = (ylo_g - oy) * inv_dy
                    dwz = w_g * inv_dz

                    def strip_leaf(c, bit, st2):
                        def run(_, st3):
                            tx0 = (bclus_ref[c, 0] - ox) * inv_dx
                            tx1 = (bclus_ref[c, 3] - ox) * inv_dx
                            txmn = jnp.minimum(tx0, tx1)
                            txmx = jnp.maximum(tx0, tx1)
                            start = bclus_ref[c, 6].astype(jnp.int32)
                            cnt = bclus_ref[c, 7].astype(jnp.int32)

                            def member(p, st4):
                                t_b, wi = st4[:2]
                                pf = p.astype(f)
                                th = (box_ref[p, R_DC + 1] - oy) * inv_dy
                                tz0 = (box_ref[p, R_C0 + 2] - oz) * inv_dz
                                tz1 = tz0 + dwz
                                tmn = jnp.maximum(
                                    jnp.maximum(jnp.minimum(t_ylo, th),
                                                txmn),
                                    jnp.minimum(tz0, tz1))
                                tmx = jnp.minimum(
                                    jnp.minimum(jnp.maximum(t_ylo, th),
                                                txmx),
                                    jnp.maximum(tz0, tz1))
                                t_p = jnp.where(tmn > f(T_MIN), tmn, tmx)
                                ok = ((tmx > tmn) & (t_p > f(T_MIN))
                                      & (t_p < t_b))
                                st_stats = ()
                                if stats:
                                    st_stats = (st4[2] + f(1.0),)
                                    if dda:
                                        # DDA probe — see box_thin
                                        cross = ((tmx > jnp.maximum(
                                            tmn, f(T_MIN)))
                                            & (tmn < t_b)
                                            & (alive > f(0.0)))
                                        hit = jnp.max(jnp.where(
                                            cross, f(1.0), f(0.0)))
                                        st_stats = st_stats \
                                            + (st4[3] + hit,)
                                return (jnp.where(ok, t_p, t_b),
                                        jnp.where(ok, f(n_dyn) + pf, wi)) \
                                    + st_stats

                            return jax.lax.fori_loop(start, start + cnt,
                                                     member, tuple(st3))

                        # zero-trip gate on the strip's wide-mask bit —
                        # the x hoist itself is skipped for masked strips
                        return jax.lax.fori_loop(
                            0, jnp.where(bit > 0, 1, 0), run, tuple(st2))

                out1 = _culled_loop(bclus_ref, n_bclus[:2], box_thin,
                                    thin1, n_box, leaf_fn=strip_leaf)
                t_thin, widx = out1[:2]
                if stats:
                    s_mem_b = out1[2]
                    if dda:
                        s_hit_b = out1[3]

            if n_dyn:
                # dynamic spheres (random_spheres' 397, final_scene's
                # 1000 — heroes are unrolled), wide-culled; the
                # moving-center form covers static spheres (dc=0,
                # inv_dt=0 ⇒ frac·dc = 0)
                def dyn_thin(p, st2):
                    t_b, wi = st2[:2]

                    def r(i):
                        return dyn_ref[p, i]

                    if dyn_moving:
                        frac = (time - r(R_T0)) * r(R_INV_DT)
                        cx = r(R_C0) + frac * r(R_DC)
                        cy = r(R_C0 + 1) + frac * r(R_DC + 1)
                        cz = r(R_C0 + 2) + frac * r(R_DC + 2)
                    else:
                        # every dyn sphere is static (movers, if any,
                        # were unrolled) — no lerp per member
                        cx, cy, cz = r(R_C0), r(R_C0 + 1), r(R_C0 + 2)
                    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
                    bq = _dot3(ocx, ocy, ocz, dx, dy, dz)
                    cq = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - r(R_R2)
                    disc = bq * bq - a_dd * cq
                    pos = disc > f(0.0)
                    sq = jnp.sqrt(jnp.where(pos, disc, f(1.0)))
                    t_near = (-bq - sq) * inv_a
                    t_far = (-bq + sq) * inv_a
                    # near root if it clears T_MIN else far (t_near <
                    # t_far always, so this is the reference's two-root
                    # preference in one select)
                    t_sel = jnp.where(t_near > f(T_MIN), t_near, t_far)
                    ok = pos & (t_sel > f(T_MIN)) & (t_sel < t_b)
                    return (jnp.where(ok, t_sel, t_b),
                            jnp.where(ok, p.astype(f), wi)) \
                        + ((st2[2] + f(1.0),) if stats else ())

                thin0 = (t_thin, widx) + ((s_mem_s,) if stats else ())
                out0 = _culled_loop(sclus_ref, n_sclus, dyn_thin, thin0,
                                    n_dyn)
                t_thin, widx = out0[:2]
                if stats:
                    s_mem_s = out0[2]

            if n_dyn or n_box:
                # ---- attribute resolution: one transposed gather,
                # skipped outright (zero-trip fori) on steps where no
                # lane's winner is a dynamic prim — e.g. medium random
                # walks, sky tiles, and unrolled-hero hits, where this
                # fixed ~600-op pass would otherwise dominate ----
                wd = widx >= f(0.0)
                st[0] = t_thin

                # compact attribute rows: fl[pos[A_x]] is field A_x
                # (fields zero for every dyn/box prim are not in the
                # table at all — the gather's per-band cost is ~7 µs
                # per step, measured, so bands are precious)
                pos = {a: i for i, a in enumerate(attr_fields)}

                def resolve(_, stt):
                    stt = list(stt)
                    col = jnp.maximum(widx, f(0.0)).astype(jnp.int32)
                    fl = _attr_gather(attr_ref, col,
                                      -(-len(attr_fields) // 8))

                    def flx(a):
                        return fl[pos[a]]

                    # sphere winner normal: (p − c(time)) / r (reference
                    # src/sphere.rs:55-57); invr=0 zeroes it for boxes
                    if A_T0 in pos:
                        fracw = (time - flx(A_T0)) * flx(A_INVDT)
                        cxw = flx(A_G0) + fracw * flx(A_G3)
                        cyw = flx(A_G0 + 1) + fracw * flx(A_G3 + 1)
                        czw = flx(A_G0 + 2) + fracw * flx(A_G3 + 2)
                    else:  # every dyn sphere is static
                        cxw, cyw, czw = (flx(A_G0), flx(A_G0 + 1),
                                         flx(A_G0 + 2))
                    wnx = (ox + t_thin * dx - cxw) * flx(A_INVR)
                    wny = (oy + t_thin * dy - cyw) * flx(A_INVR)
                    wnz = (oz + t_thin * dz - czw) * flx(A_INVR)
                    if n_box:
                        # box winner face: recompute the chosen side's
                        # per-axis slab candidates and match t (ties broken
                        # x → y → z; measure-zero). Face normal = +axis like
                        # the reference's rects (src/rect.rs:62-68)
                        t0x = (flx(A_G0) - ox) * inv_dx
                        t1x = (flx(A_G3) - ox) * inv_dx
                        t0y = (flx(A_G0 + 1) - oy) * inv_dy
                        t1y = (flx(A_G3 + 1) - oy) * inv_dy
                        t0z = (flx(A_G0 + 2) - oz) * inv_dz
                        t1z = (flx(A_G3 + 2) - oz) * inv_dz
                        tmn = jnp.maximum(jnp.maximum(
                            jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                            jnp.minimum(t0z, t1z))
                        use_en = tmn > f(T_MIN)
                        tx_c = jnp.where(use_en, jnp.minimum(t0x, t1x),
                                         jnp.maximum(t0x, t1x))
                        ty_c = jnp.where(use_en, jnp.minimum(t0y, t1y),
                                         jnp.maximum(t0y, t1y))
                        is_x = t_thin == tx_c
                        is_y = (t_thin == ty_c) & (t_thin != tx_c)
                        one, zero = f(1.0), f(0.0)
                        is_box = flx(A_TYPE) == f(2.0)
                        wnx = jnp.where(is_box,
                                        jnp.where(is_x, one, zero), wnx)
                        wny = jnp.where(is_box,
                                        jnp.where(is_y, one, zero), wny)
                        wnz = jnp.where(
                            is_box,
                            jnp.where(is_x, zero,
                                      jnp.where(is_y, zero, one)), wnz)
                    flipw = flx(A_FLIP)

                    def mg(new, old):
                        return jnp.where(wd, new, old)

                    stt[1] = mg(wnx * flipw, stt[1])
                    stt[2] = mg(wny * flipw, stt[2])
                    stt[3] = mg(wnz * flipw, stt[3])
                    stt[4] = mg(flx(A_MAT), stt[4])
                    if has_metal or has_diel:
                        # zero when no dyn/box prim is metal/dielectric
                        stt[5] = mg(flx(A_PARAM) if A_PARAM in pos
                                    else f(0.0), stt[5])
                    for k in range(3):
                        stt[6 + k] = mg(flx(A_EMIT + k), stt[6 + k])
                        stt[9 + k] = mg(flx(A_ALB_E + k), stt[9 + k])
                    # extra fields mirror the attr layout at offset −17
                    # (R_ALB_ODD..R_IMG_W ↔ A_ALB_O..A_IMG_W); a feature
                    # the dyn table lacks still CLEARS for dyn winners
                    # (the lane may carry an unrolled prim's value)
                    for i, fid in enumerate(extra_fields):
                        val = flx(fid - 17) if fid - 17 in pos else f(0.0)
                        stt[12 + i] = mg(val, stt[12 + i])
                    sp = SPECIAL_BASE
                    if img_flip:
                        stt[sp] = mg(flipw, stt[sp])
                        sp += 1
                    if uv_carry:
                        # thin winners are spheres/boxes — never
                        # carried-UV prims (image rects always unroll,
                        # image cubes never merge)
                        for k in range(3):
                            stt[sp + k] = mg(f(0.0), stt[sp + k])
                    return tuple(stt)

                if "resolve" in ABLATE:  # timing diagnostics only
                    pass
                elif RESOLVE_GATE:
                    st = list(jax.lax.fori_loop(
                        0, jnp.any(wd).astype(jnp.int32), resolve,
                        tuple(st)))
                else:
                    st = list(resolve(0, tuple(st)))

            (t_best, nx_b, ny_b, nz_b, mat_b, par_b,
             emr, emg, emb, alr, alg, alb_) = st[:12]
            pos_x = 12
            if has_checker:
                aor, aog, aob, chk = st[pos_x:pos_x + 4]
                pos_x += 4
            if has_noise:
                noiz, nsc = st[pos_x:pos_x + 2]
                pos_x += 2
            if has_image:
                imgf, ibase, ihh, iww = st[pos_x:pos_x + 4]
                pos_x += 4
            if img_flip:
                flp_w = st[pos_x]
                pos_x += 1
            if uv_carry:
                uu_c, vv_c, uvf = st[pos_x:pos_x + 3]
                pos_x += 3

            if med_kinds:
                # ---- ConstantMedium events (reference src/medium.rs:
                # 28-56): analytic entry/exit on the infinite line,
                # clamped to [T_MIN, closest surface], exponential
                # free flight −(1/ρ)·ln U. skip_med suppresses every
                # event for lanes whose dense-medium walk already
                # concluded no-scatter on this segment (re-rolling the
                # memoryless flight would double the scatter chance).
                # Runs BEFORE the texture blocks so a medium winner's
                # albedo texture (med_tex) evaluates at the scatter
                # point through the same checker/noise/image code ----
                t_med, mar, mag, mab, mdn, mex = media_events(
                    ox, oy, oz, dx, dy, dz, a_dd, inv_a, t_best,
                    skip_med)
                skip_med = jnp.zeros((SUB, LANES), f)  # consumed
                med_event = t_med < t_best
                evt_dense = jnp.where(med_event, mdn, f(0.0))
                t_best = jnp.where(med_event, t_med, t_best)
                mat_b = jnp.where(med_event, f(MAT_ISOTROPIC), mat_b)
                alr = jnp.where(med_event, mar, alr)
                alg = jnp.where(med_event, mag, alg)
                alb_ = jnp.where(med_event, mab, alb_)
                emr = jnp.where(med_event, f(0.0), emr)
                emg = jnp.where(med_event, f(0.0), emg)
                emb = jnp.where(med_event, f(0.0), emb)
                # a medium winner replaces the occluded surface's texture
                # state with its own (med_tex; image media sample at
                # u=v=0 — reference src/medium.rs:44-50 arbitrary hit
                # attributes) or, for solid-albedo media, CLEARS the
                # carried flags — since this block moved ahead of the
                # texture blocks, a stale chk/noiz/imgf would shade the
                # medium with the occluded surface's texture evaluated
                # at the scatter point
                if med_tex:
                    (m_aor, m_aog, m_aob, m_chk, m_noiz, m_nsc, m_imgf,
                     m_ibase, m_ihh, m_iww) = mex
                else:
                    m_chk = m_noiz = m_imgf = f(0.0)
                if has_checker:
                    chk = jnp.where(med_event, m_chk, chk)
                    if med_tex:
                        aor = jnp.where(med_event, m_aor, aor)
                        aog = jnp.where(med_event, m_aog, aog)
                        aob = jnp.where(med_event, m_aob, aob)
                if has_noise:
                    noiz = jnp.where(med_event, m_noiz, noiz)
                    if med_tex:
                        nsc = jnp.where(med_event, m_nsc, nsc)
                if has_image:
                    imgf = jnp.where(med_event, m_imgf, imgf)
                    if med_tex:
                        ibase = jnp.where(med_event, m_ibase, ibase)
                        ihh = jnp.where(med_event, m_ihh, ihh)
                        iww = jnp.where(med_event, m_iww, iww)
                    # uv_carry, not has_image: the carried-UV registers
                    # exist only for image rects / image media (a
                    # checker- or noise-albedo medium beside an image
                    # sphere has has_image without uv_carry)
                    if uv_carry:
                        uvf = jnp.where(med_event, m_imgf, uvf)
                        uu_c = jnp.where(med_event, f(0.0), uu_c)
                        vv_c = jnp.where(med_event, f(0.0), vv_c)

            if has_checker:
                # checker sign at the winning surface hit point
                # (reference src/texture.rs:40-47)
                px = ox + t_best * dx
                py = oy + t_best * dy
                pz = oz + t_best * dz
                sines = (jnp.sin(f(10.0) * px) * jnp.sin(f(10.0) * py)
                         * jnp.sin(f(10.0) * pz))
                use_odd = ((sines < f(0.0)).astype(f) * chk) > f(0.0)
                alr = jnp.where(use_odd, aor, alr)
                alg = jnp.where(use_odd, aog, alg)
                alb_ = jnp.where(use_odd, aob, alb_)

            if has_noise:
                # marble albedo at the winning surface hit point:
                # 0.5·(1 + sin(scale·x + 5·turb(p, 7))) (reference
                # src/texture.rs:66-70), Perlin evaluated in-kernel with
                # the hash-gradient form (ops/perlin.py)
                px = ox + t_best * dx
                py = oy + t_best * dy
                pz = oz + t_best * dz
                use_noise = noiz > f(0.0)
                # the 7-octave turbulence is the most expensive shading
                # block in the kernel; skip it entirely on bounces where
                # no lane hit a noise prim (zero-trip fori, same trick
                # as the image fetch)
                turb = jax.lax.fori_loop(
                    0, jnp.any(use_noise).astype(jnp.int32),
                    lambda _, a: _turb3(px, py, pz, perlin_seed),
                    jnp.zeros((SUB, LANES), f))
                marble = f(0.5) * (f(1.0)
                                   + jnp.sin(nsc * px + f(5.0) * turb))
                alr = jnp.where(use_noise, marble, alr)
                alg = jnp.where(use_noise, marble, alg)
                alb_ = jnp.where(use_noise, marble, alb_)

            if has_image:
                # nearest-texel image albedo (reference
                # src/texture.rs:86-108). Sphere winners map UV from the
                # unit normal (src/sphere.rs:7-15) — pre-flip object
                # normal via the carried flip when img_flip (build gates
                # image spheres to unrotated, so no R₋ is needed); rect
                # and medium winners use the selection-time carried UV
                # (uvf > 0) — world-frame rect projections / the
                # reference's u=v=0 medium attributes.
                if img_flip:
                    nux = nx_b * flp_w
                    nuy = ny_b * flp_w
                    nuz = nz_b * flp_w
                else:
                    nux, nuy, nuz = nx_b, ny_b, nz_b
                phi = _atan2(nuz, nux)
                theta = _asin(jnp.clip(nuy, f(-1.0), f(1.0)))
                uu = f(1.0) - (phi + f(math.pi)) * f(0.5 / math.pi)
                # compat_uv reproduces the reference's FRAC_2_PI constant
                # (src/sphere.rs:13) — see SceneTables.compat_uv_bug
                v_off = (2.0 / math.pi) if compat_uv else (math.pi / 2.0)
                vv = (theta + f(v_off)) * f(1.0 / math.pi)
                if uv_carry:
                    use_uvc = uvf > f(0.0)
                    uu = jnp.where(use_uvc, uu_c, uu)
                    vv = jnp.where(use_uvc, vv_c, vv)
                iww_i = iww.astype(jnp.int32)
                ihh_i = ihh.astype(jnp.int32)
                ii = jnp.clip((uu * iww).astype(jnp.int32), 0, iww_i - 1)
                jj = jnp.clip(((f(1.0) - vv) * ihh).astype(jnp.int32),
                              0, ihh_i - 1)
                n_img_rows, img_wpad = img_ref.shape
                jrow = jnp.clip(ibase.astype(jnp.int32) + jj, 0,
                                n_img_rows - 1)
                ii = jnp.clip(ii, 0, img_wpad - 1)
                use_img = imgf > f(0.0)
                # lanes that didn't hit an image prim carry junk rows;
                # collapse them onto an active lane's row so the fetch's
                # per-chunk gating sees only genuinely needed chunks, and
                # skip the whole fetch when no lane needs it
                jrow = jnp.where(
                    use_img, jrow,
                    jnp.min(jnp.where(use_img, jrow, n_img_rows - 1)))
                packed = jax.lax.fori_loop(
                    0, jnp.any(use_img).astype(jnp.int32),
                    lambda _, p: _image_fetch(img_ref, jrow, ii),
                    jnp.zeros((SUB, LANES), jnp.int32))
                # u8f / 255 is the same correctly-rounded value the
                # builder stores in the XLA tier's f32 atlas
                tr = ((packed >> 16) & 255).astype(f) / f(255.0)
                tg = ((packed >> 8) & 255).astype(f) / f(255.0)
                tb = (packed & 255).astype(f) / f(255.0)
                alr = jnp.where(use_img, tr, alr)
                alg = jnp.where(use_img, tg, alg)
                alb_ = jnp.where(use_img, tb, alb_)

            if emis_tex:
                # texture-generic DiffuseLight (reference
                # src/material.rs:133-151): a light winner's emission is
                # its evaluated texture value, which the blocks above
                # left in the albedo registers (textured lights carry
                # R_EMIT = 0; solid lights carry albedo 0, so the add is
                # exact for both). Medium winners are ISOTROPIC → 0.
                is_light = (mat_b == f(MAT_DIFFUSE_LIGHT)).astype(f)
                emr = emr + is_light * alr
                emg = emg + is_light * alg
                emb = emb + is_light * alb_

            hit = (t_best < f(BIG)).astype(f) * alive

            # hit point (surface or medium event)
            px = ox + t_best * dx
            py = oy + t_best * dy
            pz = oz + t_best * dz

            # ---- emitted + background (reference src/color.rs:8-22) ----
            rad_r = rad_r + hit * thr_r * emr
            rad_g = rad_g + hit * thr_g * emg
            rad_b = rad_b + hit * thr_b * emb
            miss = alive * (f(1.0) - (t_best < f(BIG)).astype(f))
            if background == BG_SKY:
                inv_len = jax.lax.rsqrt(a_dd)
                ty = f(0.5) * (dy * inv_len + f(1.0))
                rad_r = rad_r + miss * thr_r * (f(1.0) - f(0.5) * ty)
                rad_g = rad_g + miss * thr_g * (f(1.0) - f(0.3) * ty)
                rad_b = rad_b + miss * thr_b * f(1.0)
            # BG_BLACK adds nothing

            # ---- scatter (reference src/material.rs) ----
            su0 = _uniform((SUB, LANES))
            su1 = _uniform((SUB, LANES))
            su2 = _uniform((SUB, LANES))
            if has_diel:
                u_branch = _uniform((SUB, LANES))
            cos_t = f(2.0) * su0 - f(1.0)
            sin_t = jnp.sqrt(jnp.maximum(f(0.0), f(1.0) - cos_t * cos_t))
            sphi = f(2.0 * math.pi) * su1
            # ball radius ~ cbrt(U): P(max of 3 uniforms <= r) = r^3
            # exactly, and two extra PRNG draws + two maxes are far
            # cheaper on the VPU than the exp(log/3) polynomial pair
            # (cbrt itself has no Mosaic lowering)
            srad = jnp.maximum(jnp.maximum(su2, _uniform((SUB, LANES))),
                               _uniform((SUB, LANES)))
            spx = srad * sin_t * jnp.cos(sphi)
            spy = srad * sin_t * jnp.sin(sphi)
            spz = srad * cos_t

            # lambertian: n + ball sample (src/material.rs:49-53)
            ndx = nx_b + spx
            ndy = ny_b + spy
            ndz = nz_b + spz
            att_r, att_g, att_b = alr, alg, alb_
            ok = (mat_b != f(MAT_DIFFUSE_LIGHT)).astype(f)

            if med_kinds:
                # isotropic phase function: bare ball sample
                # (src/material.rs:164-168)
                is_iso = mat_b == f(MAT_ISOTROPIC)
                ndx = jnp.where(is_iso, spx, ndx)
                ndy = jnp.where(is_iso, spy, ndy)
                ndz = jnp.where(is_iso, spz, ndz)

            if has_metal or has_diel:
                inv_len = jax.lax.rsqrt(a_dd)
                udx, udy, udz = dx * inv_len, dy * inv_len, dz * inv_len

            if has_metal:
                # reflect(unit(d), n) + fuzz*ball (src/material.rs:76-87)
                is_met = mat_b == f(MAT_METAL)
                ddn_u = _dot3(udx, udy, udz, nx_b, ny_b, nz_b)
                mdx = udx - f(2.0) * ddn_u * nx_b + par_b * spx
                mdy = udy - f(2.0) * ddn_u * ny_b + par_b * spy
                mdz = udz - f(2.0) * ddn_u * nz_b + par_b * spz
                met_ok = _dot3(mdx, mdy, mdz, nx_b, ny_b, nz_b) > f(0.0)
                ndx = jnp.where(is_met, mdx, ndx)
                ndy = jnp.where(is_met, mdy, ndy)
                ndz = jnp.where(is_met, mdz, ndz)
                # bool-valued selects lower poorly in Mosaic (i8<->i1
                # trunc); keep the masks in f32 arithmetic instead
                is_met_f = is_met.astype(f)
                ok = (is_met_f * met_ok.astype(f)
                      + (f(1.0) - is_met_f) * ok)

            if has_diel:
                # dielectric (src/material.rs:105-126)
                is_diel = mat_b == f(MAT_DIELECTRIC)
                d_dot_n = _dot3(dx, dy, dz, nx_b, ny_b, nz_b)
                d_len = jnp.sqrt(a_dd)
                exiting = d_dot_n > f(0.0)
                sgn = jnp.where(exiting, f(-1.0), f(1.0))
                onx, ony, onz = sgn * nx_b, sgn * ny_b, sgn * nz_b
                eta = jnp.where(exiting, par_b, f(1.0) / par_b)
                cosine = jnp.where(exiting, par_b * d_dot_n / d_len,
                                   -d_dot_n / d_len)
                dt_u = _dot3(udx, udy, udz, onx, ony, onz)
                disc_r = f(1.0) - eta * eta * (f(1.0) - dt_u * dt_u)
                can_refract = disc_r > f(0.0)
                sq_r = jnp.sqrt(jnp.where(can_refract, disc_r, f(1.0)))
                rfx = eta * (udx - onx * dt_u) - onx * sq_r
                rfy = eta * (udy - ony * dt_u) - ony * sq_r
                rfz = eta * (udz - onz * dt_u) - onz * sq_r
                r0 = (f(1.0) - par_b) / (f(1.0) + par_b)
                r0 = r0 * r0
                one_c = f(1.0) - cosine
                one_c2 = one_c * one_c
                schlick = r0 + (f(1.0) - r0) * one_c2 * one_c2 * one_c
                refl_prob = jnp.where(can_refract, schlick, f(1.0))
                take_refr = can_refract & (u_branch >= refl_prob)
                ddn = d_dot_n
                refx = dx - f(2.0) * ddn * nx_b
                refy = dy - f(2.0) * ddn * ny_b
                refz = dz - f(2.0) * ddn * nz_b
                gdx = jnp.where(take_refr, rfx, refx)
                gdy = jnp.where(take_refr, rfy, refy)
                gdz = jnp.where(take_refr, rfz, refz)
                ndx = jnp.where(is_diel, gdx, ndx)
                ndy = jnp.where(is_diel, gdy, ndy)
                ndz = jnp.where(is_diel, gdz, ndz)
                att_r = jnp.where(is_diel, f(1.0), att_r)
                att_g = jnp.where(is_diel, f(1.0), att_g)
                att_b = jnp.where(is_diel, f(1.0), att_b)
            # depth cap: scatter only while depth < 50 (src/color.rs:9)
            below_cap = (bcnt < depth_v).astype(f)
            cont = hit * ok * below_cap

            thr_r = jnp.where(cont > f(0.0), thr_r * att_r, thr_r)
            thr_g = jnp.where(cont > f(0.0), thr_g * att_g, thr_g)
            thr_b = jnp.where(cont > f(0.0), thr_b * att_b, thr_b)

            if rr_depth is not None:
                # Russian roulette (opt-in, unbiased; not in the
                # reference): beyond rr_depth bounces survive with
                # p = max throughput channel, compensate by 1/p
                u_rr = _uniform((SUB, LANES))
                q = jnp.clip(jnp.maximum(thr_r, jnp.maximum(thr_g, thr_b)),
                             f(0.05), f(1.0))
                rl = (bcnt >= f(rr_depth)).astype(f)
                surv = (f(1.0) - rl) + rl * (u_rr < q).astype(f)
                boost = cont * rl * surv
                inv_q = f(1.0) / q
                thr_r = jnp.where(boost > f(0.0), thr_r * inv_q, thr_r)
                thr_g = jnp.where(boost > f(0.0), thr_g * inv_q, thr_g)
                thr_b = jnp.where(boost > f(0.0), thr_b * inv_q, thr_b)
                cont = cont * surv

            live = cont > f(0.0)
            ox = jnp.where(live, px, ox)
            oy = jnp.where(live, py, oy)
            oz = jnp.where(live, pz, oz)
            dx = jnp.where(live, ndx, dx)
            dy = jnp.where(live, ndy, dy)
            dz = jnp.where(live, ndz, dz)
            # -- bank samples whose path just terminated --
            died = alive * (one - cont)
            if kpix > 1:
                # route the dead sample to its pixel's accumulator bank
                # via arithmetic masks (bank is per-lane; a data-dependent
                # index would be a scatter)
                for k in range(kpix):
                    mk = died * (bank < f(k + 0.5)).astype(f) \
                        * (bank > f(k - 0.5)).astype(f)
                    accs[k][0] = accs[k][0] + mk * rad_r
                    accs[k][1] = accs[k][1] + mk * rad_g
                    accs[k][2] = accs[k][2] + mk * rad_b
                acc_r, acc_g, acc_b = accs[0]
            else:
                acc_r = acc_r + died * rad_r
                acc_g = acc_g + died * rad_g
                acc_b = acc_b + died * rad_b
            scnt = scnt + died
            if kpix > 1:
                # advance to the next pixel bank once this one's spp
                # quota fills (exact f32: integers < 2^24)
                bank = jnp.where(scnt >= (bank + f(1.0)) * spp_v,
                                 bank + f(1.0), bank)
            bcnt = bcnt + cont

            # (disabled under Russian roulette: the walk's collapsed
            # bounces would bypass the per-bounce survival lottery)
            if int_kinds and med_kinds and rr_depth is None:
                # ---- dense-medium walk (subsurface random walks,
                # reference pattern tests/test.rs:469-483): a lane whose
                # path just scattered inside a sealed dense medium
                # bounces to termination here. Each walk bounce tests
                # only the medium-interior prims (host-computed
                # conservative set) instead of running a full wavefront
                # step — on final_scene those walks run to the depth-50
                # cap and were over half of all steps. Exact semantics:
                # same flight/direction sampling as the main loop; a
                # no-scatter conclusion is handed to the next main step
                # via skip_med (the flight is memoryless, but re-rolling
                # a segment already ruled out would bias density up). --
                # a lane at the depth cap must NOT walk: its next hit
                # only contributes emission, and the main step must roll
                # that segment's medium-vs-surface race exactly once
                # (reference src/color.rs:9 — the 50th scatter is the
                # last; the walk's wk update keeps the invariant after
                # entry)
                walking = ((evt_dense > f(0.5)) & (cont > f(0.0))
                           & (bcnt < depth_v))

                def w_cond(ws):
                    return jnp.any(ws[10] > f(0.0))

                def w_body(ws):
                    (wox, woy, woz, wdx, wdy, wdz, wtr, wtg, wtb,
                     wbc, wk, wsk) = ws
                    a2 = _dot3(wdx, wdy, wdz, wdx, wdy, wdz)
                    ia2 = f(1.0) / a2
                    # nearest interior surface (t only; no attributes —
                    # the main loop re-traces the exit hit exactly)
                    t_s = jnp.full((SUB, LANES), f(BIG))
                    for j, k2 in enumerate(int_kinds):
                        def r2(i, j=j):
                            return int_ref[j, i]

                        if k2 == "box":
                            iwx, iwy, iwz = (_safe_inv(wdx), _safe_inv(wdy),
                                             _safe_inv(wdz))
                            t0 = (r2(R_C0) - wox) * iwx
                            t1 = (r2(R_DC) - wox) * iwx
                            tmn = jnp.minimum(t0, t1)
                            tmx = jnp.maximum(t0, t1)
                            t0 = (r2(R_C0 + 1) - woy) * iwy
                            t1 = (r2(R_DC + 1) - woy) * iwy
                            tmn = jnp.maximum(tmn, jnp.minimum(t0, t1))
                            tmx = jnp.minimum(tmx, jnp.maximum(t0, t1))
                            t0 = (r2(R_C0 + 2) - woz) * iwz
                            t1 = (r2(R_DC + 2) - woz) * iwz
                            tmn = jnp.maximum(tmn, jnp.minimum(t0, t1))
                            tmx = jnp.minimum(tmx, jnp.maximum(t0, t1))
                            t_p = jnp.where(tmn > f(T_MIN), tmn, tmx)
                            ok2 = (tmx > tmn) & (t_p > f(T_MIN))
                        elif k2 == "rect":
                            d_kn = _dot3(wdx, wdy, wdz, r2(R_KN),
                                         r2(R_KN + 1), r2(R_KN + 2))
                            o_kn = _dot3(wox, woy, woz, r2(R_KN),
                                         r2(R_KN + 1), r2(R_KN + 2))
                            nonpar = d_kn != f(0.0)
                            t_p = (r2(R_KOFF) - o_kn) / jnp.where(
                                nonpar, d_kn, f(1.0))
                            xa = (_dot3(wox, woy, woz, r2(R_AN),
                                        r2(R_AN + 1), r2(R_AN + 2))
                                  + t_p * _dot3(wdx, wdy, wdz, r2(R_AN),
                                                r2(R_AN + 1),
                                                r2(R_AN + 2))
                                  - r2(R_AOFF))
                            yb = (_dot3(wox, woy, woz, r2(R_BN),
                                        r2(R_BN + 1), r2(R_BN + 2))
                                  + t_p * _dot3(wdx, wdy, wdz, r2(R_BN),
                                                r2(R_BN + 1),
                                                r2(R_BN + 2))
                                  - r2(R_BOFF))
                            ok2 = (nonpar & (t_p > f(T_MIN))
                                   & (xa >= r2(R_A0)) & (xa <= r2(R_A1))
                                   & (yb >= r2(R_B0)) & (yb <= r2(R_B1)))
                        else:
                            if k2 == "moving":
                                frac = (time - r2(R_T0)) * r2(R_INV_DT)
                                cx = r2(R_C0) + frac * r2(R_DC)
                                cy = r2(R_C0 + 1) + frac * r2(R_DC + 1)
                                cz = r2(R_C0 + 2) + frac * r2(R_DC + 2)
                            else:
                                cx, cy, cz = (r2(R_C0), r2(R_C0 + 1),
                                              r2(R_C0 + 2))
                            ocx, ocy, ocz = wox - cx, woy - cy, woz - cz
                            bq = _dot3(ocx, ocy, ocz, wdx, wdy, wdz)
                            cq = _dot3(ocx, ocy, ocz, ocx, ocy,
                                       ocz) - r2(R_R2)
                            disc = bq * bq - a2 * cq
                            pos = disc > f(0.0)
                            sq = jnp.sqrt(jnp.where(pos, disc, f(1.0)))
                            t_near = (-bq - sq) * ia2
                            t_far = (-bq + sq) * ia2
                            t_p = jnp.where(t_near > f(T_MIN), t_near,
                                            t_far)
                            ok2 = pos & (t_p > f(T_MIN))
                        t_s = jnp.minimum(t_s, jnp.where(ok2, t_p,
                                                         f(BIG)))

                    t_m2, ma_r, ma_g, ma_b, mdn2, _ = media_events(
                        wox, woy, woz, wdx, wdy, wdz, a2, ia2, t_s,
                        jnp.zeros((SUB, LANES), f))
                    evt = t_m2 < f(BIG)
                    adv = (wk > f(0.0)) & evt
                    stop_s = (wk > f(0.0)) & ~evt
                    # isotropic rescatter (reference src/material.rs:
                    # 164-168): bare ball sample, radius via max-of-3
                    u0w = _uniform((SUB, LANES))
                    u1w = _uniform((SUB, LANES))
                    cw = f(2.0) * u0w - f(1.0)
                    sw = jnp.sqrt(jnp.maximum(f(0.0),
                                              f(1.0) - cw * cw))
                    phw = f(2.0 * math.pi) * u1w
                    rw = jnp.maximum(
                        jnp.maximum(_uniform((SUB, LANES)),
                                    _uniform((SUB, LANES))),
                        _uniform((SUB, LANES)))
                    nwx = rw * sw * jnp.cos(phw)
                    nwy = rw * sw * jnp.sin(phw)
                    nwz = rw * cw
                    wox = jnp.where(adv, wox + t_m2 * wdx, wox)
                    woy = jnp.where(adv, woy + t_m2 * wdy, woy)
                    woz = jnp.where(adv, woz + t_m2 * wdz, woz)
                    wdx = jnp.where(adv, nwx, wdx)
                    wdy = jnp.where(adv, nwy, wdy)
                    wdz = jnp.where(adv, nwz, wdz)
                    wtr = jnp.where(adv, wtr * ma_r, wtr)
                    wtg = jnp.where(adv, wtg * ma_g, wtg)
                    wtb = jnp.where(adv, wtb * ma_b, wtb)
                    wbc = wbc + adv.astype(f)
                    wsk = jnp.where(stop_s, f(1.0), wsk)
                    # keep walking while the event medium is dense and
                    # the depth cap is not reached
                    wk = (adv.astype(f) * mdn2
                          * (wbc < depth_v).astype(f))
                    return (wox, woy, woz, wdx, wdy, wdz, wtr, wtg,
                            wtb, wbc, wk, wsk)

                ws = jax.lax.while_loop(
                    w_cond, w_body,
                    (ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
                     bcnt, walking.astype(f), skip_med))
                (ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
                 bcnt, _, skip_med) = ws

            extra = ()
            if kpix > 1:
                extra = (bank,)
                for k in range(1, kpix):
                    extra = extra + tuple(accs[k])
            return (ox, oy, oz, dx, dy, dz, time,
                    thr_r, thr_g, thr_b, rad_r, rad_g, rad_b, cont,
                    bcnt, scnt, acc_r, acc_g, acc_b, skip_med) + extra \
                + (((s_steps, s_mem_s, s_mem_b, s_busy)
                    + ((s_hit_b,) if dda else ()))
                   if stats else ())

        def unfinished(carry):
            alive, scnt = carry[13], carry[15]
            return jnp.max(jnp.where(alive > f(0.0), f(1.0),
                                     (scnt < spp_v * f(kpix))
                                     .astype(f))) > f(0.0)

        zero = jnp.zeros((SUB, LANES), f)
        one_a = jnp.full((SUB, LANES), f(1.0))
        # iota-derived zero: splat-constant inits give Mosaic a
        # replicated layout that some carry updates can't relayout
        # inside the while (`s_busy + alive`, skip_med selects) — anchor
        # the late-added carries to lanes
        zero_c = (row + col).astype(f) * f(0.0)
        st = (zero, zero, zero, zero, zero, one_a,  # o, d=(0,0,1) dummy
              zero, one_a, one_a, one_a, zero, zero, zero,
              zero, zero, zero, zero, zero, zero, zero_c)
        if kpix > 1:
            st = st + (zero_c,) * n_extra
        if stats:
            st = st + (zero_c,) * (5 if dda else 4)
        st = jax.lax.while_loop(unfinished, step, st)

        if kpix > 1:
            # bank-major rows per tile, matching the host pix layout
            banks = [list(st[16:19])]
            for k in range(1, kpix):
                banks.append(list(st[21 + 3 * (k - 1):21 + 3 * k]))
            for c in range(3):
                out_ref[c] = jnp.concatenate([b[c] for b in banks],
                                             axis=0)
        else:
            out_ref[0] = st[16]
            out_ref[1] = st[17]
            out_ref[2] = st[18]
        if stats:
            pad_z = [jnp.zeros((SUB, LANES), f)] * (kpix - 1)

            def srow(a):
                return jnp.concatenate([a] + pad_z, axis=0) \
                    if kpix > 1 else a

            out_ref[3] = srow(st[20 + n_extra])   # wavefront steps
            out_ref[4] = srow(st[21 + n_extra])   # sphere member tests
            out_ref[5] = srow(st[22 + n_extra])   # box member tests
            out_ref[6] = srow(st[23 + n_extra])   # per-lane busy steps
            if dda:
                out_ref[7] = srow(st[24 + n_extra])  # DDA-crossed boxes

    return kernel


@partial(jax.jit,
         static_argnames=("kinds", "rect_groups", "n_dyn", "n_box",
                          "n_sclus", "n_bclus", "med_kinds", "flags",
                          "background", "nx", "ny", "grid", "interpret",
                          "rr_depth", "perlin_seed", "block", "stats",
                          "int_kinds", "attr_fields", "kpix", "dda"))
def _trace_call(rec, dyn_rec, box_rec, sclus, bclus, med_rec, cam_rec,
                params, img, attr, kinds, rect_groups, n_dyn, n_box,
                n_sclus, n_bclus, med_kinds, flags, background, nx, ny,
                grid, interpret=False, rr_depth=None, perlin_seed=0,
                block=None, stats=False, pix=None, int_rec=None,
                int_kinds=(), attr_fields=(), kpix=1, dda=False):
    kernel = _make_kernel(kinds, rect_groups, n_dyn, n_box, n_sclus,
                          n_bclus, med_kinds, flags, background, nx, ny,
                          rr_depth=rr_depth, perlin_seed=perlin_seed,
                          block=block, stats=stats,
                          explicit_pix=pix is not None,
                          int_kinds=int_kinds, attr_fields=attr_fields,
                          kpix=kpix, dda=dda)
    n_rows = (8 if dda else 7) if stats else 3
    if int_rec is None:
        int_rec = jnp.zeros((1, REC), jnp.float32)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 8 + [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    operands = [rec, dyn_rec, box_rec, sclus, bclus, med_rec, cam_rec,
                params, img, attr, int_rec]
    if pix is not None:
        # per-lane pixel table: kpix (SUB, LANES) banks per tile
        in_specs.append(pl.BlockSpec((kpix * SUB, LANES),
                                     lambda g: (g, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(pix)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_rows, kpix * SUB, LANES),
                               lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, grid * kpix * SUB, LANES),
                                       jnp.float32),
    )(*operands)


def tile_bounds(grid: int, n_dev: int) -> list[int]:
    """Contiguous tile-grid split across devices: monotone bounds with
    bounds[0] = 0, bounds[-1] = grid, ceil-sized spans (the LAST devices
    may get short or ZERO spans — grid=5 over 4 devices is 2,2,1,0, and
    _dispatch_chunks skips empty spans; max span is optimal either way).
    Every grid position is rendered exactly once regardless of device
    count (tests/test_pallas_record.py pins this)."""
    per = -(-grid // n_dev)
    bounds = [min(i * per, grid) for i in range(n_dev + 1)]
    bounds[-1] = grid
    return bounds


_SCENE_CACHE: dict = {}
_CAM_CACHE: dict = {}


def pick_block(nx: int, ny: int) -> tuple[int, int]:
    """2D pixel-block tile shape (BX, BY = TILE//BX) minimizing the
    padded lane count for an nx×ny image (dynamic-loop scenes; edge
    blocks clamp and are cropped at assembly). Shared with
    tools/kernel_stats.py so diagnostics measure the renderer's layout."""
    bx = min((32, 64, 128, 256), key=lambda w: (
        -(-nx // w) * w * (-(-ny // (TILE // w)) * (TILE // w))))
    return bx, TILE // bx


def balanced_pix_table(order: np.ndarray, n_pix: int, kpix: int):
    """Snake-striped kpix-bank pixel table from a cost permutation →
    (perm, grid, pix_table[grid·kpix·SUB, LANES]) — THE lane→pixel
    layout of the balanced kernel (index n_pix = dummy padding slot).
    Snake: reverse the within-bank order of odd banks so a lane's kpix
    pixels sum to ~the tile mean (straight striping would hand lane j
    the j-th cheapest pixel of EVERY bank — correlated totals, tail
    preserved). Shared with tools/kernel_stats.py — a hand-kept copy
    there once drifted (missing kpix under RT_BAL_MODE=spatial)."""
    grid = -(-n_pix // (TILE * kpix))
    ids = np.full(grid * kpix * TILE, n_pix, np.int32)
    ids[:n_pix] = order
    ids = ids.reshape(grid, kpix, TILE)
    ids[:, 1::2] = ids[:, 1::2, ::-1].copy()
    return ids.reshape(-1), grid, ids.reshape(grid * kpix * SUB, LANES)


def _perm_cache_key(cam_np, nx, ny, max_depth, rr_depth, devices, kpix):
    """Cache key for the cost-balance permutation, keyed on the camera
    record's VALUE (tiny, ~20 floats) — an id(cam) key could be reused by
    a new camera after GC and silently serve a stale permutation
    (scheduling degrades; renders stay correct since any bijection
    scatters correctly). Value-keying also lets two identical cameras
    share one probe. Device IDENTITY (not just count) is part of the key:
    the cached pix_dev uploads are committed to specific devices, and a
    hit under a different device list would hand jit operands on the
    wrong chip."""
    return ("perm", bytes(np.asarray(cam_np).tobytes()), nx, ny,
            max_depth, rr_depth, tuple(str(d) for d in devices), kpix)


def _identity_cached(cache, obj, build):
    """Cache `build(obj)` under the pytree's identity.

    Guarded by a weakref (id reuse after GC) AND the ids of every leaf:
    JAX arrays are immutable, but the dataclass FIELDS are reassignable
    (`scene.tex_color = ...`), so a leaf-id mismatch must invalidate.
    Returns (value, aux_dict) where aux_dict is an empty per-entry dict
    the caller may use for derived state (e.g. device uploads).
    """
    import weakref

    key = id(obj)
    leaves = tuple(id(x) for x in jax.tree.leaves(obj))
    hit = cache.get(key)
    if hit is not None and hit[0]() is obj and hit[1] == leaves:
        return hit[2], hit[3]
    value = build(obj)
    ref = weakref.ref(obj, lambda _: cache.pop(key, None))
    cache[key] = (ref, leaves, value, {})
    return value, cache[key][3]


def _cached_scene_record(scene):
    """(record tuple, per-device upload cache) for a SceneTables object.

    Saves the batched host pull + host packing (~0.5-1.5 s through the
    device tunnel) and the per-device uploads on every re-render of the
    same scene (benchmarks, spp sweeps, interactive use).
    """
    return _identity_cached(_SCENE_CACHE, scene, build_scene_record)


def _morton(y, x):
    """Interleave the low 16 bits of y (odd positions) and x (even)."""
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    return (spread(y) << 1) | spread(x)


def _cost_permutation(dev_args0, dev, cam_np, max_depth, kinds,
                      rect_groups, n_dyn, n_box, n_sclus, n_bclus,
                      med_kinds, flags, scene, nx, ny, block, rr_depth,
                      int_kinds, attr_fields, kpix=1):
    """Measure per-pixel path cost with a 2-spp stats probe and return a
    pixel permutation for cost-balanced tiles.

    The wavefront's tile time is set by its slowest lane; with lane =
    image-order pixel, one expensive pixel (a medium random walk, a
    total-internal-reflection loop) stalls 8191 cheap ones — measured
    lane occupancy on final_scene is ~25%. Sorting pixels into
    cost-alike tiles makes every lane of a tile comparably busy.
    Within each cost bucket pixels keep their 2D-block order, so the
    cluster guards retain most of their spatial coherence.
    """
    bxw, byh = block
    gx, gy = -(-nx // bxw), -(-ny // byh)
    grid_b = gx * gy
    # fixed probe seed: the permutation is cached across renders of the
    # same (scene, camera, size), so it must not depend on the caller's
    # seed or the first caller would steer every later render's layout
    probe_spp = int(os.environ.get("RT_PROBE_SPP", "4"))
    params, cam_dev = jax.device_put(
        (np.asarray([0x5BD1, probe_spp, max_depth, 0], np.int32),
         cam_np), dev)
    out = np.asarray(_trace_call(
        dev_args0[0], dev_args0[1], dev_args0[2], dev_args0[3],
        dev_args0[4], dev_args0[5], cam_dev, params, dev_args0[6],
        dev_args0[7], kinds, rect_groups, n_dyn, n_box, n_sclus, n_bclus,
        med_kinds, flags, scene.background, nx, ny, grid_b, False,
        rr_depth, scene.perlin_seed, block, True, None, dev_args0[8],
        int_kinds, attr_fields))
    busy = out[6].reshape(gy, gx, byh, bxw).transpose(0, 2, 1, 3)
    cost = busy.reshape(gy * byh, gx * bxw)[:ny, :nx]
    n_pix = nx * ny
    # path length has a heavy tail, so a few-spp per-pixel estimate is
    # noise-dominated and would scramble the sort (measured: it made
    # tiles WORSE than spatial blocks). Expensive regions are spatially
    # contiguous — a box filter borrows the neighbors' samples,
    # multiplying the effective probe spp by the window area.
    k = int(os.environ.get("RT_SMOOTH", "9"))
    k |= 1  # the k//2-pad integral-image arithmetic below needs odd k;
    #         an even RT_SMOOTH would crash with a shape mismatch
    pad = np.pad(cost, k // 2, mode="edge")
    ii = np.zeros((pad.shape[0] + 1, pad.shape[1] + 1), np.float64)
    ii[1:, 1:] = pad.cumsum(0).cumsum(1)
    cost = (ii[k:, k:] - ii[:-k, k:] - ii[k:, :-k]
            + ii[:-k, :-k]).reshape(-1)
    yy, xx = np.divmod(np.arange(n_pix), nx)
    if kpix > 1 and os.environ.get("RT_BAL_MODE", "band") == "spatial":
        # A/B alternative (measured REJECT, kept for hardware re-runs):
        # spatially-compact equal-count tiles — morton-order chunks of
        # kpix·TILE pixels, cost-sorted only WITHIN each chunk, hoping
        # the kpix-bank snake striping equalizes lane totals locally and
        # the compact tiles restore cluster-guard coherence (band mode
        # costs final_scene sphere member tests 76% → 85%). Measured on
        # v5e: final_scene a wash (7.2 vs 7.3M), random_spheres WORSE
        # (38.5 vs 45.9M) — a morton chunk spans sky + sphere field, and
        # that within-tile cost spread tails harder than the band tiles'
        # residual sample noise.
        order = np.argsort(_morton(yy, xx), kind="stable")
        chunk = np.empty(n_pix, np.int64)
        chunk[order] = np.arange(n_pix) // (kpix * TILE)
        return np.lexsort((np.arange(n_pix), cost, chunk)) \
            .astype(np.int32)
    # equal-population cost buckets (rank-based), 2D-block tie-break
    rank = np.empty(n_pix, np.int64)
    rank[np.argsort(cost, kind="stable")] = np.arange(n_pix)
    bucket = rank * int(os.environ.get("RT_BUCKETS", "32")) // n_pix
    blk = (yy // byh) * gx + (xx // bxw)
    return np.lexsort((np.arange(n_pix), blk, bucket)).astype(np.int32)


def render_pallas(scene: SceneTables, cam, nx: int, ny: int, spp: int,
                  seed: int = 0, max_depth: int = 50,
                  spp_chunk: int | None = None,
                  interpret: bool = False,
                  rr_depth: int | None = None,
                  devices=None, timers=None, progress=None,
                  balance: bool | None = None,
                  checkpoint: str | None = None,
                  _stop_after_chunks: int | None = None) -> np.ndarray:
    """Full-image render on the megakernel → float32 [ny, nx, 3] with the
    reference's gamma (sqrt + clamp, tests/test.rs:72-75).

    devices: list of TPU devices to split the pixel-tile grid across
    (defaults to all visible devices; scene tables replicate, each device
    renders a contiguous tile range — the sample axis is per-device
    seeded, so any split is deterministic for a given seed and device
    count). Raises UnsupportedScene when the scene needs the XLA tier.

    balance: cost-balanced pixel scheduling (_cost_permutation). Default
    (None): on for dynamic-loop scenes at spp ≥ 8, where the one-time
    2-spp probe amortizes; renders stay deterministic per (seed, config)
    since the probe is. Off disables the probe and uses 2D-block tiles.

    checkpoint: optional .npz path — per-pixel radiance sums save after
    every sample chunk, and a matching partial render resumes at the
    next chunk, bit-identical to an uninterrupted run (chunk content
    depends only on (seed, chunk id, device index, layout) — all in
    the meta). The XLA tier's protocol (render.py) at chunk
    granularity; tunnel crashes mid-multi-minute-render no longer
    restart from zero. The meta digests everything image-changing:
    scene/camera content, static flags, the resolved layout (balance,
    kpix, device count), and the RT_* kernel knobs.

    _stop_after_chunks: TEST HOOK (tools/tpu_parity.py kill-resume
    check) — return after N chunks as if the process had died.
    """
    if nx * ny > 1 << 24:
        # the in-kernel lane→pixel mapping is exact only for pixel ids
        # < 2^24 (f32 integer range — see _pix_rowcol); beyond that the
        # XLA tier renders correctly in pixel blocks
        raise UnsupportedScene(
            f"{nx}x{ny} = {nx * ny} pixels exceeds the kernel's exact "
            "f32 pixel-id range (2^24); use the XLA tier")
    if timers is None:
        from ..utils.timers import Timers
        timers = Timers()  # unobserved sink

    with timers.phase("record_build"):
        (rec_np, kinds, rect_groups, dyn_np, n_dyn, box_np, n_box, sclus_np,
         n_sclus, bclus_np, n_bclus, med_np, med_kinds, flags, img_np,
         attr_np, attr_fields, int_np,
         int_kinds), dev_cache = _cached_scene_record(scene)
    cam_np, _ = _identity_cached(_CAM_CACHE, cam, build_camera_record)
    n_pix = nx * ny
    if n_dyn or n_box:
        # scenes with dynamic cluster loops use compact 2D pixel-block
        # tiles so the cluster guards see coherent rays; pick the
        # power-of-two block width minimizing the padded lane count
        # (edge blocks clamp and are cropped at assembly). All-unrolled
        # scenes keep the padding-free linear strips — their kernels
        # have no guards to help.
        block = pick_block(nx, ny)
        grid = -(-nx // block[0]) * (-(-ny // block[1]))
    else:
        block = None
        grid = -(-n_pix // TILE)

    if devices is None:
        devices = [d for d in jax.devices() if d.platform == "tpu"] \
            or jax.devices()[:1]
    n_dev = min(len(devices), grid)
    devices = devices[:n_dev]
    # one batched device_put per device (per-array puts would each pay a
    # tunnel roundtrip); repeated renders of the same scene reuse the
    # resident tables (JAX arrays are immutable, so the cache is sound)
    with timers.phase("upload"):
        dev_args = []
        for d in devices:
            tables = dev_cache.get(d)
            if tables is None:
                tables = jax.device_put((rec_np, dyn_np, box_np, sclus_np,
                                         bclus_np, med_np, img_np,
                                         attr_np, int_np), d)
                dev_cache[d] = tables
            dev_args.append(tables)

    if balance is None:
        balance = (BALANCE and block is not None and spp >= 8
                   and not interpret)
    perm = None
    kpix = 1
    pix_dev = [None] * n_dev
    if balance:
        # each lane renders kpix pixels snake-striped across the tile's
        # cost ranks (see KPIX); capped so padding never exceeds one
        # tile's worth of dummy slots
        kpix = max(1, min(KPIX, n_pix // TILE))
        perm_key = _perm_cache_key(cam_np, nx, ny, max_depth, rr_depth,
                                   devices[:n_dev], kpix)
        cached = dev_cache.get(perm_key)
        if cached is None:
            with timers.phase("balance_probe"):
                order = _cost_permutation(
                    dev_args[0], devices[0], cam_np, max_depth,
                    kinds, rect_groups, n_dyn, n_box, n_sclus, n_bclus,
                    med_kinds, flags, scene, nx, ny, block, rr_depth,
                    int_kinds, attr_fields, kpix)
                # perm doubles as the lane-slot → pixel scatter map; its
                # flat row-major order must equal the kernel's out rows
                # (tile, bank, sub, lane)
                perm, grid, pix_full = balanced_pix_table(order, n_pix,
                                                          kpix)
                n_dev = min(n_dev, grid)
                bounds = tile_bounds(grid, n_dev)
                rows = kpix * SUB
                pix_dev = [jax.device_put(
                    pix_full[bounds[di] * rows:bounds[di + 1] * rows], d)
                    for di, d in enumerate(devices[:n_dev])]
            dev_cache[perm_key] = (perm, grid, bounds, pix_dev)
        else:
            perm, grid, bounds, pix_dev = cached
            n_dev = len(bounds) - 1
        devices = devices[:n_dev]
    else:
        bounds = tile_bounds(grid, n_dev)

    if spp_chunk is None:
        spp_chunk = spp
    sums = np.zeros((n_pix, 3), np.float64)
    ck_meta = None
    start_done = 0
    if checkpoint:
        import hashlib
        from ..render import _CK_LAYOUT_VERSION, _render_digest
        h = hashlib.sha256()
        for k in sorted(os.environ):
            if k.startswith("RT_"):
                h.update(f"{k}={os.environ[k]};".encode())
        env_digest = int.from_bytes(h.digest()[:8], "little") >> 1
        ck_meta = np.asarray(
            [_CK_LAYOUT_VERSION, 1, nx, ny, spp, seed, max_depth,
             spp_chunk, -1 if rr_depth is None else rr_depth,
             int(bool(balance)), n_dev, kpix, env_digest,
             _render_digest(scene, cam, False)])
        if os.path.exists(checkpoint):
            ck = np.load(checkpoint)
            if np.array_equal(ck["meta"], ck_meta):
                sums = np.asarray(ck["sums"], np.float64)
                start_done = int(ck["done"])
    try:
        _dispatch_chunks(sums, spp, spp_chunk, devices, bounds, dev_args,
                         cam_np, seed, max_depth, kinds, rect_groups,
                         n_dyn, n_box, n_sclus, n_bclus, med_kinds, flags,
                         scene, nx, ny, n_pix, interpret, rr_depth, timers,
                         progress, block, perm, pix_dev, int_kinds,
                         attr_fields, kpix, checkpoint=checkpoint,
                         ck_meta=ck_meta, start_done=start_done,
                         stop_after_chunks=_stop_after_chunks)
    except Exception:
        # a TPU worker crash/restart invalidates resident buffers; drop
        # every cached device table so the caller's retry re-uploads to
        # the fresh worker instead of re-raising on dead handles
        for entry in _SCENE_CACHE.values():
            entry[3].clear()
        raise

    img = np.sqrt(np.clip(sums / spp, 0.0, None))
    return np.clip(img, 0.0, 1.0).reshape(ny, nx, 3).astype(np.float32)


def _dispatch_chunks(sums, spp, spp_chunk, devices, bounds, dev_args,
                     cam_np, seed, max_depth, kinds, rect_groups, n_dyn,
                     n_box, n_sclus, n_bclus, med_kinds, flags, scene,
                     nx, ny, n_pix, interpret, rr_depth, timers,
                     progress=None, block=None, perm=None, pix_dev=None,
                     int_kinds=(), attr_fields=(), kpix=1,
                     checkpoint=None, ck_meta=None, start_done=0,
                     stop_after_chunks=None):
    done = 0
    chunk_id = 0
    n_run = 0
    while done < spp:
        cur = min(spp_chunk, spp - done)
        if done < start_done:
            # resuming: these chunks' sums are already in the loaded
            # accumulator; advance the (done, chunk_id) seeding state
            # without dispatching
            done += cur
            chunk_id += 1
            continue
        # the first chunk's dispatch carries the Mosaic compile;
        # np.asarray in the gather is the true device sync (tunnel
        # semantics — utils/timers.py)
        with timers.phase("compile+chunk0" if chunk_id == 0 else "dispatch"):
            outs = []
            for di, dev in enumerate(devices):
                g0, g1 = bounds[di], bounds[di + 1]
                if g1 == g0:
                    continue
                # one batched put for the per-chunk scalars + camera
                params, cam_dev = jax.device_put(
                    (np.asarray([(seed + 0x9E37 * chunk_id + 7919 * di)
                                 & 0x7FFFFFFF,
                                 cur, max_depth, g0], np.int32),
                     cam_np), dev)
                outs.append(_trace_call(
                    dev_args[di][0], dev_args[di][1], dev_args[di][2],
                    dev_args[di][3], dev_args[di][4], dev_args[di][5],
                    cam_dev, params, dev_args[di][6],
                    dev_args[di][7], kinds, rect_groups, n_dyn, n_box,
                    n_sclus, n_bclus, med_kinds, flags, scene.background,
                    nx, ny, g1 - g0, interpret, rr_depth,
                    scene.perlin_seed, None if perm is not None else block,
                    False, pix_dev[di] if perm is not None else None,
                    dev_args[di][8], int_kinds, attr_fields,
                    kpix if perm is not None else 1))
            # all device dispatches are in flight; gather in order
            full = np.concatenate([np.asarray(o) for o in outs], axis=1)
        if perm is not None:
            # balanced scheduling: lane-slot i (tile, bank, sub, lane
            # row-major) rendered pixel perm[i]; dummy slots (id n_pix,
            # interleaved into the last tile's banks when kpix > 1) are
            # dropped. The real slots are a bijection onto pixels, so the
            # fancy-index add touches each row once.
            lanes = full.transpose(1, 2, 0).reshape(-1, 3)
            valid = perm < n_pix
            sums[perm[valid]] += lanes[valid]
        elif block is None:
            sums += full.transpose(1, 2, 0).reshape(-1, 3)[:n_pix]
        else:
            # de-block: (3, gy·gx, BY·BX) → image rows, crop the padding
            bxw, byh = block
            gx, gy = -(-nx // bxw), -(-ny // byh)
            img3 = full.reshape(3, gy, gx, byh, bxw).transpose(0, 1, 3, 2, 4)
            sums += img3.reshape(3, gy * byh, gx * bxw)[:, :ny, :nx] \
                .reshape(3, n_pix).transpose(1, 0)
        done += cur
        chunk_id += 1
        n_run += 1
        if progress is not None:
            progress(done, spp)
        if checkpoint:
            with timers.phase("checkpoint_io"):
                tmp = checkpoint + ".tmp.npz"
                np.savez(tmp, meta=ck_meta, sums=sums, done=done)
                os.replace(tmp, checkpoint)
        if stop_after_chunks is not None and n_run >= stop_after_chunks:
            return
