"""Worker process for the 2-process multi-host CPU test.

Usage: python tools/multihost_worker.py <coordinator> <num_procs> <pid> <out>

Each process contributes 4 virtual CPU devices; after
`jax.distributed.initialize()` the global mesh spans 8 devices across the
two processes, exactly like a 2-host TPU pod slice over DCN (SURVEY.md §5
"Distributed communication backend"). Runs one sharded differentiable
train step (parallel/sharding.py train_step_sharded) and writes the
fully-replicated loss + gradient norms as JSON (process 0 only).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")


def main():
    coord, n_procs, pid, out_path = (sys.argv[1], int(sys.argv[2]),
                                     int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n_procs, process_id=pid)
    assert jax.process_count() == n_procs
    assert len(jax.devices()) == 4 * n_procs

    import jax.numpy as jnp
    import numpy as np

    from raytracing_rust_tpu.models import builders
    from raytracing_rust_tpu.parallel.sharding import (make_mesh,
                                                       train_step_sharded)

    scene = builders.two_spheres()
    preset = builders.PRESETS["two_spheres"]
    cam = preset.camera()
    nx, ny, spp = 32, 18, 4
    pix = jnp.arange(64, dtype=jnp.int32)
    key = jax.random.key(3)
    target = jnp.zeros((64, 3), jnp.float32)
    mesh = make_mesh(dp=4, sp=2)
    loss, grads = train_step_sharded(scene, cam, pix, key, target,
                                     nx, ny, spp, 4, mesh)
    # loss and replicated-parameter grads are fully replicated → every
    # process holds complete copies and can read them back
    result = {
        "process_count": jax.process_count(),
        "n_devices": len(jax.devices()),
        "loss": float(loss),
        "g_tex": float(jnp.linalg.norm(grads.tex_color)),
        "g_geom": float(jnp.linalg.norm(grads.prim_data)),
    }
    if pid == 0:
        with open(out_path, "w") as fh:
            json.dump(result, fh)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
