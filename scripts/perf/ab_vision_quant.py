"""One-process A/B: SigLIP vision-encode throughput, dense bf16 tower vs
int8 weight-only vs int8+W8A8 (dynamic per-token int8 activations onto
the int8 MXU).

The tower is COMPUTE-bound at the production batch of 32 frames (weights
read once per batch), which is why weight-only int8 measured slower in
round 2 (dequant conversions in a compute-bound path; quant.py
docstring) and the tower ships dense. W8A8 is the opposite bet: it
halves the MXU cycle cost, which is exactly what a compute-bound path
wants — this script measures whether it pays and what it costs in
feature error (the 49-token frame embeds feed everything downstream).

Usage: python scripts/perf/ab_vision_quant.py [--preset 7b-int8]
       [--frames 64] [--reps 5]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import jax
import numpy as np

import bench
from aha_tpu.ops import quant
from aha_tpu.streaming.engine import StreamEngine


def encode_fps(engine, frames, reps):
    # device-resident pixels (bench.py convention): isolates the tower —
    # the tunnel's H2D path is measured separately in BASELINE.md and
    # would otherwise swamp the compute difference
    import jax.numpy as jnp

    dev = jax.device_put(jnp.asarray(frames))
    out = engine.encode_frames(dev)          # warm/compile
    jax.device_get(out.sum())
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = engine.encode_frames(dev)
        jax.device_get(out.sum())
        vals.append(frames.shape[0] / (time.perf_counter() - t0))
    vals.sort()
    return vals[len(vals) // 2], vals, np.asarray(
        jax.device_get(out), np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="7b-int8")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    engine, cfg = bench.build(args.preset)
    r = cfg.frame_resolution
    frames = np.random.default_rng(0).integers(
        0, 255, (args.frames, r, r, 3), dtype=np.uint8)

    med0, v0, feats0 = encode_fps(engine, frames, args.reps)
    print(f"vision dense bf16:        {med0:.1f} fps  "
          f"{['%.1f' % v for v in v0]}", flush=True)
    ref_scale = float(np.mean(np.abs(feats0))) or 1.0

    # quantize ONLY the vision tower on top of the already-int8 trunk
    # (trunk kernels are {qvalue, scale} dicts, which quantize_params
    # skips; vision kernels are still dense)
    params_q = quant.quantize_params(engine.params, quantize_vision=True)
    eng_q = StreamEngine(params_q, cfg, engine.policy)

    med1, v1, feats1 = encode_fps(eng_q, frames, args.reps)
    err1 = float(np.mean(np.abs(feats1 - feats0))) / ref_scale
    print(f"vision int8 weight-only:  {med1:.1f} fps ({med1 / med0:.2f}x)  "
          f"{['%.1f' % v for v in v1]}  rel-err {err1:.4f}", flush=True)

    quant._FORCE_BACKEND = "w8a8"
    try:
        eng_q8 = StreamEngine(params_q, cfg, engine.policy)
        med2, v2, feats2 = encode_fps(eng_q8, frames, args.reps)
    finally:
        quant._FORCE_BACKEND = None
    err2 = float(np.mean(np.abs(feats2 - feats0))) / ref_scale
    print(f"vision int8 + W8A8:       {med2:.1f} fps ({med2 / med0:.2f}x)  "
          f"{['%.1f' % v for v in v2]}  rel-err {err2:.4f}", flush=True)


if __name__ == "__main__":
    main()
