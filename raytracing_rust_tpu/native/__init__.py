"""ctypes loader for the native host runtime (rt_native.cpp).

Compiled on first use with g++ into the package directory; every caller
has a pure-Python fallback, so a missing toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rt_native.cpp")
_SO = os.path.join(_DIR, "librt_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO)
        lib.rt_build_bvh.restype = ctypes.c_int
        lib.rt_encode_ppm.restype = ctypes.c_long
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_arrays(lo: np.ndarray, hi: np.ndarray, leaf_size: int):
    """Native FlatBVH build → (node_min, node_max, left, right, count,
    order) NumPy arrays, or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    P = lo.shape[0]
    lo = np.ascontiguousarray(lo, np.float64)
    hi = np.ascontiguousarray(hi, np.float64)
    nn_cap = 2 * P + 1
    no_cap = 2 * P + leaf_size
    node_min = np.empty((nn_cap, 3), np.float32)
    node_max = np.empty((nn_cap, 3), np.float32)
    left = np.empty(nn_cap, np.int32)
    right = np.empty(nn_cap, np.int32)
    count = np.empty(nn_cap, np.int32)
    order = np.empty(no_cap, np.int32)
    out_nn = ctypes.c_int32()
    out_no = ctypes.c_int32()
    c = np.ctypeslib.as_ctypes
    rc = lib.rt_build_bvh(
        c(lo.reshape(-1)), c(hi.reshape(-1)), P, leaf_size,
        c(node_min.reshape(-1)), c(node_max.reshape(-1)), c(left), c(right),
        c(count), c(order), ctypes.byref(out_nn), ctypes.byref(out_no))
    if rc != 0:
        return None
    nn, no = out_nn.value, out_no.value
    return (node_min[:nn], node_max[:nn], left[:nn], right[:nn], count[:nn],
            order[:no])


_REF_SRC = os.path.join(_DIR, "ref_tracer.cpp")
_REF_SO = os.path.join(_DIR, "libref_tracer.so")
_ref_lib = None
_ref_tried = False


def _load_ref():
    global _ref_lib, _ref_tried
    if _ref_tried:
        return _ref_lib
    _ref_tried = True
    try:
        if (not os.path.exists(_REF_SO)
                or os.path.getmtime(_REF_SO) < os.path.getmtime(_REF_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _REF_SO, _REF_SRC],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_REF_SO)
        lib.ref_trace.restype = ctypes.c_double
        _ref_lib = lib
    except Exception:
        _ref_lib = None
    return _ref_lib


def ref_trace(scene_id: int, nx: int, ny: int, spp: int,
              look_from, look_at, vfov: float,
              vup=(0.0, 1.0, 0.0), aperture: float = 0.1,
              focus_dist: float = 10.0, time0: float = 0.0,
              time1: float = 1.0, max_depth: int = 50, seed: int = 1234,
              background: int = 0):
    """Render with the faithful scalar C++ mirror of the reference
    (ref_tracer.cpp — reference tests/test.rs:55-85 + src/color.rs:6-23).
    Returns (mean_radiance [ny, nx, 3] pre-gamma, render_seconds), or None
    when the native toolchain is unavailable. scene_id: 0 = cornell_box,
    1 = oracle_spheres, 2 = cornell_smoke (fixed back wall, the
    framework-default geometry), 3 = moving_checker (motion blur +
    checker ground + metal), 4 = earth_image (synthetic 32x16
    image-textured sphere, reference earth config), 5 = simple_light
    over the hash-Perlin field, 6 = fog_slab (density-sensitive
    free-flight check)."""
    lib = _load_ref()
    if lib is None:
        return None
    out = np.empty((ny, nx, 3), np.float64)
    qsum = ctypes.c_longlong()
    vec = lambda v: (ctypes.c_double * 3)(*[float(x) for x in v])
    secs = lib.ref_trace(
        scene_id, nx, ny, spp, max_depth,
        ctypes.c_ulonglong(seed), background,
        vec(look_from), vec(look_at), vec(vup),
        ctypes.c_double(vfov), ctypes.c_double(aperture),
        ctypes.c_double(focus_dist), ctypes.c_double(time0),
        ctypes.c_double(time1),
        np.ctypeslib.as_ctypes(out.reshape(-1)), ctypes.byref(qsum))
    if secs < 0:
        return None
    return out, float(secs)


def ref_hash_turb(pts: np.ndarray, depth: int = 7, seed: int = 0):
    """Pointwise hash-Perlin turbulence from the C++ mirror's independent
    scalar transcription (ref_tracer.cpp hash_perlin) — pts [n, 3] f64 →
    [n] f64, or None when the native toolchain is unavailable. Used by
    tests to pin ops/perlin.py's FIELD (not just the noise-scene
    radiometry) across implementations."""
    lib = _load_ref()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, np.float64)
    n = pts.shape[0]
    out = np.empty(n, np.float64)
    lib.ref_hash_turb(np.ctypeslib.as_ctypes(pts.reshape(-1)), n,
                      int(depth), ctypes.c_uint(seed),
                      np.ctypeslib.as_ctypes(out))
    return out


def encode_ppm(img: np.ndarray) -> str | None:
    """Native P3 encoding of a gamma-corrected [ny, nx, 3] float image,
    byte-identical to utils.image_io.to_ppm; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    ny, nx, _ = img.shape
    img = np.ascontiguousarray(img, np.float32)
    cap = 32 + 13 * nx * ny
    buf = ctypes.create_string_buffer(cap)
    n = lib.rt_encode_ppm(np.ctypeslib.as_ctypes(img.reshape(-1)),
                          nx, ny, buf, ctypes.c_long(cap))
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")
