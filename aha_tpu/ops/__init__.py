"""TPU compute ops: RoPE, KV ring-buffer cache, attention, pooling, smoothing,
and Pallas kernels for the hot paths."""
