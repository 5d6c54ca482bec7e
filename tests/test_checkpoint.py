"""Resumable rendering: interrupted + resumed == uninterrupted."""

import os
import tempfile

import numpy as np

from raytracing_rust_tpu.models import builders
from raytracing_rust_tpu.render import render


def test_checkpoint_resume_bit_identical():
    preset = builders.PRESETS["two_spheres"]
    scene = preset.build()
    cam = preset.camera()
    kw = dict(nx=32, ny=32, spp=4, seed=5, max_depth=6, block_pixels=256)

    full = render(scene, cam, **kw)

    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "render.npz")
        # "interrupt" after two blocks by rendering with a doctored copy:
        # run once fully to populate the checkpoint, then truncate it back
        render(scene, cam, checkpoint=ck, **kw)
        data = dict(np.load(ck))
        assert int(data["next_block"]) == 4  # 1024 px / 256
        # rewind to block 2: zero the later blocks' sums
        sums = data["sums"].copy()
        sums[2 * 256:] = 0.0
        np.savez(ck, meta=data["meta"], sums=sums, next_block=2)

        resumed = render(scene, cam, checkpoint=ck, **kw)
    np.testing.assert_array_equal(full, resumed)


def test_checkpoint_ignored_on_config_change():
    preset = builders.PRESETS["two_spheres"]
    scene = preset.build()
    cam = preset.camera()
    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "render.npz")
        render(scene, cam, 32, 32, 4, seed=5, checkpoint=ck)
        a = render(scene, cam, 32, 32, 4, seed=6, checkpoint=ck)  # new seed
        b = render(scene, cam, 32, 32, 4, seed=6)
    np.testing.assert_array_equal(a, b)
