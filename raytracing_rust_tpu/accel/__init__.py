from .bvh import FlatBVH, build_bvh, bvh_closest_hit  # noqa: F401
