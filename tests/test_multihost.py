"""Multi-host path: 2-process `jax.distributed.initialize()` on CPU.

SURVEY.md §2 mandates a real multi-process exercise of the sharding layer
(the reference has nothing distributed). Two subprocesses each contribute
4 virtual CPU devices; the 8-device global mesh spans both processes like
a 2-host pod slice over DCN. The fully-replicated loss and gradient norms
from the cross-process sharded train step must match the same computation
on a single-process 8-device mesh — GSPMD semantics are layout- and
process-count-invariant.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_matches_single_process():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out = os.path.join(os.environ.get("TMPDIR", "/tmp"),
                       f"mh_result_{port}.json")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "multihost_worker.py"),
         coord, "2", str(pid), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outputs.append(stdout.decode(errors="replace"))
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{text[-2000:]}"
    with open(out) as fh:
        result = json.load(fh)
    os.remove(out)
    assert result["process_count"] == 2
    assert result["n_devices"] == 8

    # single-process reference on this test process's own 8-device mesh
    from raytracing_rust_tpu.models import builders
    from raytracing_rust_tpu.parallel.sharding import (make_mesh,
                                                       train_step_sharded)
    scene = builders.two_spheres()
    cam = builders.PRESETS["two_spheres"].camera()
    pix = jnp.arange(64, dtype=jnp.int32)
    key = jax.random.key(3)
    target = jnp.zeros((64, 3), jnp.float32)
    loss, grads = train_step_sharded(scene, cam, pix, key, target,
                                     32, 18, 4, 4, make_mesh(dp=4, sp=2))
    np.testing.assert_allclose(result["loss"], float(loss), rtol=1e-5)
    np.testing.assert_allclose(result["g_tex"],
                               float(jnp.linalg.norm(grads.tex_color)),
                               rtol=1e-4)
    np.testing.assert_allclose(result["g_geom"],
                               float(jnp.linalg.norm(grads.prim_data)),
                               rtol=1e-4)

    # cross-process compaction (round 5): the compacted forward mean
    # must match the plain GSPMD path over the 2-process mesh (same
    # lanes, global-lane-keyed RNG; the worker reduced both to
    # replicated scalars)
    assert result["compact_ok"] is True
    np.testing.assert_allclose(result["compact_mean"],
                               result["plain_mean"], rtol=1e-5)
