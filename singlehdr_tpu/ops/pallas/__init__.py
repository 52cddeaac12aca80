"""Pallas TPU kernels for the per-pixel hot ops.

Kernels are opt-in (``impl="pallas"`` on the corresponding ops) and fall back to
the XLA implementations on non-TPU backends.
"""
