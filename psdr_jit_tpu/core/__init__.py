"""Core math, types, RNG, warps, transforms and distributions."""
