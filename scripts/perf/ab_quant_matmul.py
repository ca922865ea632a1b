"""In-process A/B: fused Pallas quantized matmuls vs XLA jnp paths, real chip.

7B decode shapes at M=64 (one 49-token frame chunk padded). Slope-timed
in-jit loops (the axon tunnel adds ~45 ms fixed cost per dispatch).
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np
import jax, jax.numpy as jnp

from aha_tpu.ops.quant import (quantize_array, quantize_array_int4, dequantize,
                               dequantize_int4, qlinear_w8a8)
from aha_tpu.ops.pallas.fused_matmul import int4_matmul, int8_matmul


def slope(fn, x0, n1=16, n2=80, reps=4):
    def mk(n):
        @jax.jit
        def loop(x, n_=n):
            def body(i, x):
                y = fn(x)
                return x * 0.999 + y.sum(axis=1, keepdims=True).astype(x.dtype) * 1e-6
            return jax.lax.fori_loop(0, n_, body, x)
        return loop
    l1, l2 = mk(n1), mk(n2)
    ts = ([], [])
    for l, t in ((l1, ts[0]), (l2, ts[1])):
        jax.device_get(l(x0))
        for _ in range(reps):
            t0 = time.perf_counter(); jax.device_get(l(x0))
            t.append(time.perf_counter() - t0)
    return (min(ts[1]) - min(ts[0])) / (n2 - n1) * 1e3


def run(K, N, M=64, dt=jnp.bfloat16):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, dt)
    x = jnp.asarray(rng.standard_normal((M, K)), dt)
    q8 = quantize_array(w, 0)
    q4 = quantize_array_int4(w, 0)
    gb8, gb4 = K * N / 1e9, K * N / 2 / 1e9

    # parity on chip first
    ref = np.asarray(jnp.einsum("mk,kn->mn", x, dequantize(q8, dt)), np.float32)
    out = np.asarray(int8_matmul(x, q8["qvalue"], q8["scale"]), np.float32)
    err8 = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-9)
    ref4 = np.asarray(jnp.einsum("mk,kn->mn", x, dequantize_int4(q4, dt)), np.float32)
    out4 = np.asarray(int4_matmul(x, q4["q4value"], q4["scale4"]), np.float32)
    err4 = np.abs(ref4 - out4).max() / (np.abs(ref4).max() + 1e-9)
    print(f"K={K} N={N} M={M}: rel_err int8={err8:.4f} int4={err4:.4f}")

    rows = [
        ("int8-xla ", lambda xx: jnp.einsum("mk,kn->mn", xx, dequantize(q8, dt)), gb8),
        ("int8-pls ", lambda xx: int8_matmul(xx, q8["qvalue"], q8["scale"]), gb8),
        ("w8a8-xla ", lambda xx: qlinear_w8a8(xx, q8), gb8),
        ("w8a8-pls ", lambda xx: int8_matmul(xx, q8["qvalue"], q8["scale"], a8=True), gb8),
        ("int4-xla ", lambda xx: jnp.einsum("mk,kn->mn", xx, dequantize_int4(q4, dt)), gb4),
        ("int4-pls ", lambda xx: int4_matmul(xx, q4["q4value"], q4["scale4"]), gb4),
        ("w4a8-pls ", lambda xx: int4_matmul(xx, q4["q4value"], q4["scale4"], a8=True), gb4),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    for name, fn, gb in rows:
        if only and only not in name:
            continue
        t = slope(fn, x)
        print(f"  {name}: {t:.3f} ms  ({gb/t*1e3:.0f} GB/s quantized-bytes)", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run(3584, 18944)
