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
from ..ops.camera import Camera, get_rays
from ..ops.integrator import trace
from ..render import _CAM_FOLD


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
    pid = jnp.broadcast_to(pix[:, None], (npix, spp))
    # fold the sample index into sub-pixel jitter determinism via lane position
    i = (pid % nx).astype(cam.origin.dtype)
    j = (ny - 1 - pid // nx).astype(cam.origin.dtype)

    u = jax.random.uniform(jax.random.fold_in(key, _CAM_FOLD),
                           (npix, spp, 5), cam.origin.dtype)
    s = (i + u[..., 0]) / nx
    t = (j + u[..., 1]) / ny

    flat = lambda x: x.reshape(npix * spp, *x.shape[2:])
    o, d, time = get_rays(cam, flat(s), flat(t), flat(u[..., 2:5]))
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
                   rr_depth: int | None = None) -> np.ndarray:
    """Full sharded render → float32 [ny, nx, 3] (gamma like the reference)."""
    n_pix = nx * ny
    dp = mesh.shape["dp"]
    block_pixels = block_pixels or min(n_pix, 1 << 16)
    block_pixels += (-block_pixels) % dp  # divisible by dp
    base = jax.random.key(seed)

    sums = np.zeros((n_pix, 3), np.float32)
    n_blocks = -(-n_pix // block_pixels)
    for blk in range(n_blocks):
        lo = blk * block_pixels
        hi = min(lo + block_pixels, n_pix)
        ids = np.arange(lo, lo + block_pixels, dtype=np.int32)
        ids[hi - lo:] = n_pix - 1
        key = jax.random.fold_in(base, blk)
        out = render_block_sharded(scene, cam, jnp.asarray(ids), key,
                                   nx, ny, spp, max_depth, mesh,
                                   rr_depth=rr_depth)
        sums[lo:hi] += np.asarray(out)[: hi - lo]

    img = np.sqrt(np.clip(sums / spp, 0.0, None))
    return np.clip(img, 0.0, 1.0).reshape(ny, nx, 3).astype(np.float32)


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
