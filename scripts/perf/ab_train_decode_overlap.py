"""A/B: does the prefetched input pipeline actually hide host video decode
behind the train step? (VERDICT r2 weak #3 — the overlap claim must be
measured, not asserted.)

Builds a synthetic on-disk video dataset (the decode cost is real: cv2 or
the native libav decoder runs per sample), then times N train steps on the
tiny model fed by
  (a) a synchronous generator (decode+collate on the consumer thread,
      round-2's cmd_train behavior), vs
  (b) data/pipeline.batch_iterator (thread-pool decode, prefetch depth 2 —
      what cmd_train now uses).

Run: python scripts/perf/ab_train_decode_overlap.py [--steps N] [--frames K]
CPU-friendly (tiny model); on a TPU host the step runs on the chip and the
decode overlap matters more, not less.
"""

import argparse
import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np


def build_dataset(root: str, *, n_videos: int, n_frames: int, fps: float,
                  size: int, tokenizer):
    import cv2

    from aha_tpu.data.datasets import build_mixture_from_config

    vids = os.path.join(root, "videos")
    os.makedirs(vids, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_videos):
        w = cv2.VideoWriter(os.path.join(vids, f"v{i}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), fps,
                            (size * 2, size * 2))
        for _ in range(n_frames):
            w.write(rng.integers(0, 255, (size * 2, size * 2, 3),
                                 dtype=np.uint8))
        w.release()
    annos = [{"video_uid": f"v{i}.mp4", "query": f"thing {i}",
              "timestamps": [[1.0, 3.0]]} for i in range(n_videos)]
    anno_file = os.path.join(root, "train.json")
    with open(anno_file, "w") as f:
        json.dump(annos, f)
    cfg_file = os.path.join(root, "mixture.json")
    with open(cfg_file, "w") as f:
        json.dump([{
            "dataset_cls": "GroundingStreamDataset",
            "video_root": vids,
            "anno_file": anno_file,
            "metadata_path": os.path.join(root, "meta.json"),
            "frame_fps": fps,
            "max_num_frames": n_frames,
        }], f)
    return build_mixture_from_config(cfg_file, tokenizer, frame_size=size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--videos", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=1)
    args = ap.parse_args()

    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        jax.config.update("jax_platforms", "cpu")

    from aha_tpu.config import TrainConfig, aha_tiny
    from aha_tpu.data.collator import collate
    from aha_tpu.data.pipeline import batch_iterator
    from aha_tpu.models import aha
    from aha_tpu.train.trainer import init_train_state, make_train_step

    cfg = aha_tiny(vocab_size=512)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    with tempfile.TemporaryDirectory() as root:
        ds = build_dataset(root, n_videos=args.videos, n_frames=args.frames,
                           fps=4.0, size=cfg.frame_resolution, tokenizer=tok)

        train_cfg = TrainConfig(learning_rate=1e-4, grad_accum_steps=1,
                                warmup_ratio=0.0)
        state, tx, labels, scale = init_train_state(cfg, train_cfg, params,
                                                    total_steps=args.steps * 4)
        step_fn = make_train_step(cfg, train_cfg, tx, labels, scale)

        def sync_batches():
            rng = random.Random(0)
            order = list(range(len(ds)))
            while True:
                rng.shuffle(order)
                for i in range(0, len(order) - args.batch_size + 1,
                               args.batch_size):
                    examples = [ds[j] for j in order[i:i + args.batch_size]]
                    yield collate(examples, tok,
                                  v_placeholder_id=cfg.v_placeholder_id,
                                  frame_num_tokens=cfg.frame_num_tokens
                                  ).asdict()

        def run(name, it):
            nonlocal state
            import jax.numpy as jnp

            # warmup: one step at the bucketed shape
            b = next(it)
            state, parts = step_fn(state, {k: jnp.asarray(v)
                                           for k, v in b.items()})
            jax.device_get(parts.total)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                b = next(it)
                state, parts = step_fn(state, {k: jnp.asarray(v)
                                               for k, v in b.items()})
            jax.device_get(parts.total)
            dt = time.perf_counter() - t0
            sps = args.steps / dt
            print(f"{name}: {sps:.3f} steps/s ({dt:.2f}s / {args.steps})")
            return sps

        # decode-only floor: how fast can the host produce batches at all
        it = sync_batches()
        next(it)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            next(it)
        decode_sps = args.steps / (time.perf_counter() - t0)
        print(f"host decode+collate alone: {decode_sps:.3f} batches/s")

        sync_sps = run("synchronous (round-2 cmd_train)", sync_batches())
        pre_sps = run("prefetched batch_iterator (current cmd_train)",
                      batch_iterator(
                          ds, tok, batch_size=args.batch_size,
                          v_placeholder_id=cfg.v_placeholder_id,
                          frame_num_tokens=cfg.frame_num_tokens, seed=0))
        print(json.dumps({
            "decode_batches_per_s": round(decode_sps, 3),
            "sync_steps_per_s": round(sync_sps, 3),
            "prefetch_steps_per_s": round(pre_sps, 3),
            "speedup": round(pre_sps / sync_sps, 3),
        }))


if __name__ == "__main__":
    main()
