"""On-chip 7B end-to-end `aha train` run + checkpoint round-trip.

VERDICT r3 next #2: the 7B training path had only ever run as a
synthetic-batch step timing (qlora_7b_train_step.py) or a tiny-model CPU
CLI test. This script drives the FULL product loop at deployment scale on
one v5e-1: synthetic on-disk videos -> GroundingStreamDataset (cv2
decode @fps + letterbox) -> the prefetched `batch_iterator` (thread-pool
decode overlapping the step) -> `train()` (jitted int8-trunk QLoRA step,
remat=full) with orbax step checkpoints + adapter-only export, then an
orbax restore + resume that must continue the loss curve.

The ONE deviation from `cmd_train`: params come from the leaf-wise
on-device quantized materialization (qlora_7b_train_step.
random_qlora_params) instead of `from_pretrained` — this environment
cannot download the real 7B weights (docs/REAL_WEIGHTS.md), and
cmd_train's random-init path at 7B presumes a weights file (a
full-precision host-side init would not fit). Everything downstream of
param init is the exact cmd_train flow (ref train.py:102-128,
scripts/train.sh:12 save cadence).

Run ON THE CHIP (one TPU process at a time; ~4 min first compile):
    python scripts/perf/train_7b_e2e.py [--steps 20] [--tiny]
Prints one JSON summary line (step times, loss curve, checkpoint
save/restore wall-clock + sizes, peak HBM) and appends nothing.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from scripts.perf.qlora_7b_train_step import hbm_gb, random_qlora_params


def build_fixture(root: pathlib.Path, *, n_videos=4, n_frames=20, size=(96, 64)):
    """Synthetic on-disk videos + grounding annos + mixture config (the
    tests/test_data.py::test_cli_train_end_to_end fixture at 7B-relevant
    frame counts). Queries share token lengths so every batch hits one
    compiled bucket."""
    import cv2

    vids = root / "videos"
    vids.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for j in range(n_videos):
        w = cv2.VideoWriter(str(vids / f"v{j}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 4.0, size)
        for _ in range(n_frames * 4):   # 4 fps source, decoded at 1 fps
            w.write(rng.integers(0, 255, (size[1], size[0], 3), np.uint8))
        w.release()
    annos = [{"video_uid": f"v{j}.mp4", "query": f"thing {j}",
              "timestamps": [[2.0, 9.0]]} for j in range(n_videos)]
    anno_file = root / "train.json"
    anno_file.write_text(json.dumps(annos))
    config = [{
        "dataset_cls": "GroundingStreamDataset",
        "video_root": str(vids),
        "anno_file": str(anno_file),
        "metadata_path": str(root / "meta.json"),
        "frame_fps": 1.0,
        "max_num_frames": 16,          # -> T ~= 926, the MFU-sweep shape
    }]
    cfg_file = root / "mixture.json"
    cfg_file.write_text(json.dumps(config))
    return cfg_file


def dir_gib(path) -> float:
    out = subprocess.run(["du", "-sb", str(path)], capture_output=True,
                         text=True)
    try:
        return round(int(out.stdout.split()[0]) / 2**30, 3)
    except Exception:
        return -1.0


def main():
    steps = (int(sys.argv[sys.argv.index("--steps") + 1])
             if "--steps" in sys.argv else 20)
    tiny = "--tiny" in sys.argv
    resume_work = (sys.argv[sys.argv.index("--resume_phase") + 1]
                   if "--resume_phase" in sys.argv else None)
    if tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from aha_tpu.config import TrainConfig, aha_7b, aha_tiny
    from aha_tpu.data.datasets import build_mixture_from_config
    from aha_tpu.data.pipeline import batch_iterator
    from aha_tpu.ops import quant
    from aha_tpu.tokenization import build_stream_tokenizer
    from aha_tpu.train.trainer import (export_adapter, init_train_state,
                                       latest_checkpoint, restore_checkpoint,
                                       save_checkpoint, train)

    cfg = (aha_tiny(vocab_size=512).replace(dtype="float32") if tiny
           else aha_7b().replace(dtype="bfloat16"))
    tok = build_stream_tokenizer(frame_num_tokens=cfg.frame_num_tokens,
                                 vocab_size=cfg.llm.vocab_size)
    cfg = cfg.replace(v_placeholder_id=tok.v_placeholder_id,
                      eos_token_id=tok.eos_token_id)

    phase1_work = (sys.argv[sys.argv.index("--phase1") + 1]
                   if "--phase1" in sys.argv else None)
    if resume_work is not None:
        # child process: cold resume against an existing workdir (see the
        # parent's resume section). Rebuild the base, restore trained
        # leaves + optimizer + step, run 3 more steps.
        import dataclasses

        work = pathlib.Path(resume_work)
        rd = build_mixture_from_config(
            str(work / "mixture.json"), tok,
            system_prompt=TrainConfig().system_prompt,
            frame_size=cfg.frame_resolution)
        # holder-pop so no binding in THIS frame pins the pre-restore
        # trained leaves through the first step (see trainer.train)
        params_holder = [random_qlora_params(cfg, bits=8)]
        resume_cfg = TrainConfig(
            output_dir=str(work / "resume_out"), learning_rate=1e-4,
            batch_size=1, grad_accum_steps=1, seed=0, remat_policy="full",
            save_steps=10, save_total_limit=3, logging_steps=1,
            resume_from_checkpoint=latest_checkpoint(
                str(work / "train_out" / "checkpoints")))
        t0 = time.time()
        state = train(cfg, resume_cfg, params_holder.pop(), batch_iterator(
            rd, tok, batch_size=1, v_placeholder_id=cfg.v_placeholder_id,
            frame_num_tokens=cfg.frame_num_tokens, seed=0, prefetch=2,
            num_workers=2, shard_across_hosts=False),
            total_steps=steps + 3)
        print(json.dumps({"resume_wall_s": round(time.time() - t0, 1),
                          "resumed_to_step": int(state.step)}), flush=True)
        return

    assert phase1_work is not None
    work = pathlib.Path(phase1_work)
    cfg_file = build_fixture(work)
    out_dir = work / "train_out"
    train_cfg = TrainConfig(
        output_dir=str(out_dir), learning_rate=1e-4, batch_size=1,
        grad_accum_steps=1, seed=0, remat_policy="full",
        save_steps=10, save_total_limit=3, logging_steps=1,
    )
    dataset = build_mixture_from_config(
        str(cfg_file), tok, system_prompt=train_cfg.system_prompt,
        frame_size=cfg.frame_resolution)
    print(f"dataset: {len(dataset)} samples", flush=True)

    t0 = time.time()
    params = random_qlora_params(cfg, bits=8)
    print(f"params materialized in {time.time()-t0:.1f}s, "
          f"{quant.tree_nbytes(params)/2**30:.2f} GiB, "
          f"peak HBM {hbm_gb()} GiB", flush=True)

    def batches():
        return batch_iterator(
            dataset, tok, batch_size=train_cfg.batch_size,
            v_placeholder_id=cfg.v_placeholder_id,
            frame_num_tokens=cfg.frame_num_tokens, seed=0,
            prefetch=2, num_workers=2, shard_across_hosts=False)

    t0 = time.time()
    state = train(cfg, train_cfg, params, batches(), total_steps=steps)
    train_wall = time.time() - t0
    del params

    metrics = [json.loads(l) for l in
               open(out_dir / "metrics.jsonl").read().splitlines()]
    losses = [m["train/total_loss"] for m in metrics]
    t_rec = [m["time"] for m in metrics]
    # warm step time: median gap between consecutive logged steps after
    # the first two (compile + first decode fill the early gaps)
    gaps = np.diff(t_rec)[2:]
    step_ms = round(float(np.median(gaps)) * 1e3, 1) if len(gaps) else -1.0

    ckpt_dir = out_dir / "checkpoints"
    # explicit checkpoint round-trip timings at 7B scale. Trained-only
    # format (labels=): a full-tree restore would hold the live 8.2 GiB
    # trunk AND its restored copy — measured OOM on the 16 GB chip.
    from aha_tpu.train import lora as lora_lib

    labels = lora_lib.trainable_labels(
        state.tree["model"], state.tree.get("lora"),
        train_cfg.lora.finetune_modules)
    t0 = time.time()
    path = save_checkpoint(str(ckpt_dir) + "_timed", state, keep=1,
                           labels=labels)
    save_s = round(time.time() - t0, 2)
    ckpt_gib = dir_gib(path)
    t0 = time.time()
    state2 = restore_checkpoint(path, state, labels)
    restore_s = round(time.time() - t0, 2)
    step_now = int(state.step)
    assert int(state2.step) == step_now
    del state, state2, labels

    adapter_gib = dir_gib(out_dir / "adapter")
    partial = {
        "preset": "tiny" if tiny else "7b-int8-qlora",
        "steps": steps,
        "train_wall_s": round(train_wall, 1),
        "warm_step_ms": step_ms,
        "loss_first": round(losses[0], 4), "loss_last": round(losses[-1], 4),
        "losses": [round(x, 3) for x in losses],
        "ckpt_save_s": save_s, "ckpt_restore_s": restore_s,
        "ckpt_gib": ckpt_gib, "adapter_gib": adapter_gib,
        "peak_hbm_gib": hbm_gb(),
    }
    print(json.dumps(partial), flush=True)
    assert losses[-1] < losses[0], "loss must decrease over the run"


def orchestrate(steps: int, tiny: bool):
    """Run both phases as subprocesses: each phase gets a clean device
    heap (two 7B phases sharing one 16 GB chip OOM — measured: the
    parent's live trunk + optimizer next to the child's restore), and the
    resume phase exercises the realistic cold-resume shape (fresh process
    rebuilding the base, restoring trained leaves + optimizer + step)."""
    work = pathlib.Path(tempfile.mkdtemp(prefix="train7b_"))

    def run_child(flag):
        cmd = [sys.executable, os.path.abspath(__file__), flag, str(work),
               "--steps", str(steps)]
        if tiny:
            cmd.append("--tiny")
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=4800)
        sys.stderr.write(r.stderr[-2000:])
        if r.returncode != 0:
            print(r.stdout[-2000:], file=sys.stderr)
            raise SystemExit(f"{flag} failed rc={r.returncode}")
        for line in reversed(r.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        raise SystemExit(f"{flag}: no JSON summary line in stdout")

    p1 = run_child("--phase1")
    p2 = run_child("--resume_phase")
    metrics2 = [json.loads(l) for l in
                open(work / "resume_out" / "metrics.jsonl").read().splitlines()]
    resumed_steps = [m["step"] for m in metrics2]
    assert max(resumed_steps) == steps + 3, resumed_steps
    assert min(resumed_steps) > steps - 10, resumed_steps
    summary = {**p1,
               "resume_losses": [round(m["train/total_loss"], 3)
                                 for m in metrics2],
               "resume_wall_s": p2.get("resume_wall_s"),
               "resumed_to_step": p2.get("resumed_to_step")}
    print(json.dumps(summary), flush=True)
    shutil.rmtree(work, ignore_errors=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    if "--phase1" in sys.argv or "--resume_phase" in sys.argv:
        main()
    else:
        orchestrate(
            (int(sys.argv[sys.argv.index("--steps") + 1])
             if "--steps" in sys.argv else 20),
            "--tiny" in sys.argv)
