"""Model ops: dense/norm/RoPE/attention primitives, delay transforms, masks,
sampling, and Pallas kernels for the hot paths."""
