"""The recorded BASELINE gradient metric (benchlib.grad_fd_err) must stay
healthy: it sweeps ≥10 parameters across the full differentiable surface —
albedo, emission, geometry (radius + center), metal fuzz, dielectric
ref_idx, and image texels — and reports the worst |autodiff − FD|.

A broken probe (vacuous zero gradients, FD stepping across a visibility
discontinuity, or a wrong autodiff rule) shows up as a large worst-case
error; the healthy value is ~1e-6 (f32 roundoff at fixed RNG paths).
The reduced config here (16 rays, depth 4) reproduces the full metric's
error scale at ~1/20th the cost.
"""

from raytracing_rust_tpu.benchlib import grad_fd_err


def test_grad_metric_worst_case_small():
    assert grad_fd_err(n_rays=16, max_depth=4) < 1e-4
