"""Pallas TPU kernels: flash attention, single-step decode attention against a
device-resident KV cache, and block-sparse masked matmul for pruned weights."""
