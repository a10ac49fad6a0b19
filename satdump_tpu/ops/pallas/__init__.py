"""Pallas TPU kernels for the gather-shaped hot ops.

XLA's general gather lowers to ~30 Msymb/s on TPU (measured,
tools/gathervariants.py) — two orders of magnitude below the rest of the
demod chain. These kernels restructure gathers as per-tile DMA + one-hot
MXU matmuls inside VMEM.
"""
