"""Multi-chip / multi-host render + gradient sharding.

The reference is a single-threaded CPU program (SURVEY.md §2: rayon declared
but unused, Rc-based BVH). The TPU build scales the two embarrassingly
parallel axes over a `jax.sharding.Mesh`:

* `dp` — pixel tiles (data parallelism over the image);
* `sp` — samples-per-pixel batches (the "long dimension" analogue;
  partial radiance sums reduce over this axis).

We annotate lane arrays with `NamedSharding` and let GSPMD insert the
collectives (psum over `sp` for radiance, psum over the whole mesh for
parameter gradients in the differentiable path) — the idiomatic TPU answer to
NCCL/MPI (SURVEY.md §5 "Distributed communication backend"). Multi-host runs
use the same code after `jax.distributed.initialize()`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.scene import SceneTables
from ..ops.camera import Camera
from ..ops.integrator import trace
from ..render import camera_lane_rays, finalize_image


def make_mesh(devices=None, dp: int | None = None, sp: int | None = None) -> Mesh:
    """Build a (dp, sp) mesh over all (or given) devices.

    Defaults put every device on `dp` (pixel tiles) — best for single-host
    throughput; pass sp>1 to also spread samples of the same pixels.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if dp is None and sp is None:
        dp, sp = n, 1
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    assert dp * sp == n, f"mesh {dp}x{sp} != {n} devices"
    return Mesh(devices.reshape(dp, sp), ("dp", "sp"))


def _lane_radiance(scene: SceneTables, cam: Camera, pix, key, nx: int, ny: int,
                   spp: int, max_depth: int, differentiable: bool,
                   rr_depth=None):
    """Radiance sums [Npix, 3] for a [Npix, spp] lane grid.

    pix: int32[Npix]; lanes laid out [Npix, spp] so sharding P('dp','sp')
    splits pixels over dp and samples over sp.
    """
    npix = pix.shape[0]
    # flat [npix·spp] lane order (pixel-major) matches render_block's —
    # the mapping + jitter draws come from the ONE shared implementation
    pid = jnp.broadcast_to(pix[:, None], (npix, spp)).reshape(-1)
    o, d, time = camera_lane_rays(cam, pid, key, nx, ny)
    rad = trace(scene, o, d, time, key, max_depth=max_depth,
                differentiable=differentiable, rr_depth=rr_depth)
    return rad.reshape(npix, spp, 3).sum(axis=1)


@partial(jax.jit, static_argnames=("nx", "ny", "spp", "max_depth", "mesh",
                                   "rr_depth"))
def render_block_sharded(scene: SceneTables, cam: Camera, pix, key,
                         nx: int, ny: int, spp: int, max_depth: int,
                         mesh: Mesh, rr_depth=None):
    """Forward render of a pixel block, sharded (pixels × samples) over mesh.

    Scene/camera replicate; the [Npix, spp] lane grid shards P('dp', 'sp');
    the sample-axis sum reduces partial radiance over `sp` (GSPMD psum).
    """
    pix = jax.lax.with_sharding_constraint(
        pix, NamedSharding(mesh, P("dp")))
    out = _lane_radiance(scene, cam, pix, key, nx, ny, spp, max_depth, False,
                         rr_depth=rr_depth)
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P("dp", None)))


def render_sharded(scene: SceneTables, cam: Camera, nx: int, ny: int,
                   spp: int, mesh: Mesh, seed: int = 0, max_depth: int = 50,
                   block_pixels: int | None = None,
                   rr_depth: int | None = None, progress=None,
                   timers=None) -> np.ndarray:
    """Full sharded render → float32 [ny, nx, 3] (gamma like the reference).

    Sample chunking mirrors render(): block_pixels·spp_chunk lanes per
    dispatch stay under the ~2^22 lane budget (the dense intersect
    materializes [N, P, 3] temps, and one 65536·spp-lane dispatch at
    reference spp would OOM and outrun the TPU runtime watchdog).
    """
    n_pix = nx * ny
    dp = mesh.shape["dp"]
    block_pixels = block_pixels or min(n_pix, 1 << 16)
    block_pixels += (-block_pixels) % dp  # divisible by dp
    budget = max(1, (1 << 22) // block_pixels)
    spp_chunk = max(c for c in range(1, min(spp, budget) + 1)
                    if spp % c == 0)
    n_chunks = spp // spp_chunk
    base = jax.random.key(seed)
    if timers is None:
        from ..utils.timers import Timers
        timers = Timers()  # unobserved sink

    sums = np.zeros((n_pix, 3), np.float32)
    n_blocks = -(-n_pix // block_pixels)
    done = 0
    for blk in range(n_blocks):
        lo = blk * block_pixels
        hi = min(lo + block_pixels, n_pix)
        ids = np.arange(lo, lo + block_pixels, dtype=np.int32)
        ids[hi - lo:] = n_pix - 1
        pix = jnp.asarray(ids)  # ONE upload per block, not per chunk
        blk_key = jax.random.fold_in(base, blk)
        pname = "compile+block0" if blk == 0 else "dispatch"
        for ch in range(n_chunks):
            key = jax.random.fold_in(blk_key, ch)
            with timers.phase(pname):
                out = render_block_sharded(scene, cam, pix,
                                           key, nx, ny, spp_chunk,
                                           max_depth, mesh,
                                           rr_depth=rr_depth)
                sums[lo:hi] += np.asarray(out)[: hi - lo]
            done += 1
            if progress is not None:
                progress(done, n_blocks * n_chunks)

    return finalize_image(sums, spp, nx, ny)


def train_step_sharded(scene: SceneTables, cam: Camera, pix, key, target,
                       nx: int, ny: int, spp: int, max_depth: int, mesh: Mesh):
    """One differentiable "training" step: L2 photometric loss of a sharded
    render against a target, with parameter gradients psum-reduced over the
    whole mesh by GSPMD (the ray-tracing analogue of DP gradient sync —
    SURVEY.md §2 parallelism table).

    Returns (loss, grads) where grads is a SceneTables cotangent (gradients
    flow into geometry, material params, texture colors and texels).
    """

    def loss_fn(scene):
        pix_s = jax.lax.with_sharding_constraint(
            pix, NamedSharding(mesh, P("dp")))
        sums = _lane_radiance(scene, cam, pix_s, key, nx, ny, spp,
                              max_depth, True)
        img = sums / spp
        return jnp.mean((img - target) ** 2)

    # allow_int: SceneTables mixes float parameter tables with int32 tag/index
    # tables; integer leaves get float0 cotangents.
    return jax.value_and_grad(loss_fn, allow_int=True)(scene)
