"""Vectorized batch functions (numpy / pyarrow.compute kernels)."""
