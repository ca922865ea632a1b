"""Probe: achievable HBM read bandwidth over the ACTUAL serving weight
buffers (7B int8, merged projections), vs the batched decode pass.

The 819 GB/s HBM figure is a datasheet number; what the decode pass can
actually achieve depends on buffer shapes/layouts. This times a jitted
full-weight reduction (every int8 qvalue + bf16 scale + dense embed /
lm_head buffer summed) — a pure streaming read of the same bytes a
decode pass must move. If this measures ~X ms, then X is the honest
weight-stream floor for one decode pass, and BASELINE's "8.9 ms
roofline" should be read against it.

Run ON THE CHIP: python scripts/perf/probe_weight_stream.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    import bench

    engine, cfg = bench.build("7b-int8")
    params = engine.params

    leaves = jax.tree_util.tree_leaves(params)
    total_bytes = sum(l.size * l.dtype.itemsize for l in leaves)

    def stream_all(params):
        acc = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(params):
            # sum() must read every element; accumulate in f32 so nothing
            # is constant-folded away
            acc = acc + jnp.sum(leaf.astype(jnp.float32) if leaf.dtype == jnp.int8
                                else leaf.astype(jnp.float32))
        return acc

    f = jax.jit(stream_all)
    jax.device_get(f(params))          # compile
    jax.device_get(f(params))          # warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(f(params))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "total_weight_bytes_GB": round(total_bytes / 1e9, 2),
        "stream_ms": round(best * 1e3, 2),
        "achieved_GBps": round(total_bytes / best / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
