"""End-to-end inverse rendering (examples/inverse_render.py): gradient
descent through the full path tracer recovers a scene parameter."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "examples"))


def test_albedo_recovery():
    import inverse_render
    assert inverse_render.main() == 0  # max abs err < 0.08 vs ground truth
