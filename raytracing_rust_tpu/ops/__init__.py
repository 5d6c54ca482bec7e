"""Batched compute ops: camera, RNG, intersection, shading, integration."""
