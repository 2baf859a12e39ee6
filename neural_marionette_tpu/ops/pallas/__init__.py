"""Pallas TPU kernels for the hot ops."""
from .voxelize_kernel import voxelize_pallas

__all__ = ["voxelize_pallas"]
