"""Statistical regression net over all eight reference scenes.

The reference has no golden values (its checked-in PPMs are all-black
junk, SURVEY.md §4), so these bands were recorded from this framework's
own oracle-validated renderer at a fixed seed and guard every scene's
end-to-end pipeline against silent breakage. Bands are ±20% — wide
enough for MC noise at 8 spp and platform/f32 drift, tight enough to
catch a broken material, texture, transform, or medium.
"""

import numpy as np
import pytest

from raytracing_rust_tpu.models import builders
from raytracing_rust_tpu.render import render

# mean image luminance at 48x27, spp 8, depth 8, seed 11 (CPU, XLA tier)
EXPECTED = {
    "random_spheres": 0.5891,
    "two_spheres": 0.5503,
    "two_perlin_spheres": 0.6185,  # hash-gradient perlin (round 2)
    "earth": 0.7526,
    "simple_light": 0.1005,  # hash-gradient perlin (round 2)
    "cornell_box": 0.1099,  # re-recorded after the duplicate-floor dedup fix
    "cornell_smoke": 0.2290,
    "final_scene": 0.1823,
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_scene_mean_luminance(name):
    preset = builders.PRESETS[name]
    scene = preset.build()
    cam = preset.camera()
    img = render(scene, cam, 48, 27, 8, seed=11, max_depth=8)
    assert np.all(np.isfinite(img))
    mean = float(img.mean())
    lo, hi = 0.8 * EXPECTED[name], 1.2 * EXPECTED[name]
    assert lo < mean < hi, f"{name}: mean {mean:.4f} outside [{lo:.4f}, {hi:.4f}]"
