"""Compute ops: reference oracles, quantization kernels, attention kernels."""
