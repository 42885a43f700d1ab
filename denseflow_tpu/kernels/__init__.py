"""Pallas TPU kernels for the hot solver loops."""
