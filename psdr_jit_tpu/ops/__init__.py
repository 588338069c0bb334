"""Compute kernels: ray-triangle intersection (pure-JAX + Pallas), image ops."""

from .intersect import ray_intersect_detached

__all__ = ["ray_intersect_detached"]
