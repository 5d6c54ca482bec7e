"""The README's custom-scene example must run as written.

Keeps the documented SceneBuilder/make_camera/render surface honest: if a
signature in the snippet drifts, this fails before a user does.
"""

import numpy as np

from raytracing_rust_tpu.models.scene import SceneBuilder, BG_SKY
from raytracing_rust_tpu.ops.camera import make_camera
from raytracing_rust_tpu.render import render


def test_readme_custom_scene_runs():
    b = SceneBuilder(background=BG_SKY)
    ground = b.lambertian(b.checker(b.solid(0.2, 0.3, 0.1),
                                    b.solid(0.9, 0.9, 0.9)))
    b.sphere((0, -1000, 0), 1000.0, ground)
    b.sphere((-2, 1, 0), 1.0, b.dielectric(1.5))
    b.sphere((2, 1, 0), 1.0, b.metal(b.solid(0.7, 0.6, 0.5), fuzz=0.05))
    tilt = b.transform(offset=(0, 1, 0), rotate_axis="y", angle_deg=30.0)
    b.cube((-0.7, -0.7, -0.7), (0.7, 0.7, 0.7),
           b.lambertian(b.noise(2.0)), xform=tilt)
    cam = make_camera((0, 2, 8), (0, 1, 0), (0, 1, 0), vertical_fov=40,
                      aspect=16 / 9, aperture=0.1, focus_dist=8.0)
    # tiny config (the README uses 320x180x64); same code path
    img = render(b.build(), cam, 64, 36, spp=4, seed=0)
    assert img.shape == (36, 64, 3)
    assert np.isfinite(img).all()
    assert 0.2 < img.mean() < 0.9  # lit sky scene, neither black nor blown
