"""Rehearse docs/REAL_WEIGHTS.md end-to-end against a synthetic HF
checkpoint (VERDICT r4 next #6): every runbook command executes exactly as
written — at tiny scale, offline — so the real-weights day is turnkey.

Steps (numbered as in the runbook):
  §1  "Get the artifacts": scripts/make_synthetic_hf_checkpoint.py
      generates <tmp>/ov (sharded bf16 safetensors + config.json + real
      BPE tokenizer) and <tmp>/adapter (peft LoRA dir).
  §2  Conversion, both ways the runbook documents:
        (a) the code snippet — loader.load_params / load_adapter /
            apply_overrides / save_converted (+ load_converted check);
        (b) the direct CLI — `aha infer --llm_pretrained ov
            --lora_pretrained adapter --tokenizer_pretrained ov ...` on a
            synthetic clip, checking the output JSON shape.
  §3  Fixture recording: `make_golden_fixture.py --mode aha --preset tiny
      --checkpoint ov` writes an .npz; a second `--check` run replays it.
  §4  Parity-gate shape: the recorded fused-width-4 trace must match the
      per-frame trace (the test_golden_fixture assertion, run here on the
      converted params).

Run on CPU (forced in-process):
    python scripts/rehearse_real_weights.py [--keep]
Exercised in the suite by tests/test_real_weights_rehearsal.py.
"""

from __future__ import annotations

import json
import pathlib
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np


def rehearse(tmp: str, *, run_cli_subprocess: bool = False) -> dict:
    """Execute the runbook; returns a summary dict. Assumes the caller has
    already forced the CPU backend (or wants the default)."""
    import jax.numpy as jnp

    from make_synthetic_hf_checkpoint import generate

    report: dict = {}

    # --- §1: artifacts -------------------------------------------------
    ov, adapter = generate(tmp)
    ov_files = {p.name for p in pathlib.Path(ov).iterdir()}
    for required in ("model-00001-of-00002.safetensors",
                     "model.safetensors.index.json", "config.json",
                     "tokenizer.json"):
        assert required in ov_files, f"runbook §1 artifact missing: {required}"
    report["artifacts"] = sorted(ov_files)

    # --- §2a: the conversion code snippet, verbatim structure ----------
    from aha_tpu import config as C
    from aha_tpu.models import loader

    hf_cfg = json.loads((pathlib.Path(ov) / "config.json").read_text())
    cfg = C.aha_tiny(vocab_size=hf_cfg["vocab_size"])
    params = loader.load_params(ov, cfg, dtype=jnp.bfloat16)   # base model
    lora, overrides, lora_scale = loader.load_adapter(adapter, cfg)
    assert set(lora) == {"q_proj", "k_proj", "v_proj", "o_proj",
                         "gate_proj", "up_proj", "down_proj"}, sorted(lora)
    assert lora_scale == 2.0, lora_scale          # alpha 8 / r 4
    assert "projector" in overrides and "heads" in overrides
    params = loader.apply_overrides(params, overrides)
    conv_dir = str(pathlib.Path(tmp) / "aha_tpu_tiny")
    loader.save_converted(params, conv_dir)                    # orbax dir
    restored = loader.load_converted(conv_dir)
    np.testing.assert_array_equal(
        np.asarray(restored["llm"]["embed"]["weight"], np.float32),
        np.asarray(params["llm"]["embed"]["weight"], np.float32))
    report["lora_scale"] = lora_scale

    # tokenizer loads through the real HF path (runbook §2 last paragraph)
    from aha_tpu.tokenization import build_stream_tokenizer

    tok = build_stream_tokenizer(ov, frame_num_tokens=cfg.frame_num_tokens)
    cfg = cfg.replace(v_placeholder_id=tok.v_placeholder_id,
                      eos_token_id=tok.eos_token_id)
    report["tokenizer_vocab"] = int(tok.backend.vocab_size)

    # --- §2b: the direct CLI invocation --------------------------------
    out_json = pathlib.Path(tmp) / "arl.json"
    ticks = pathlib.Path(tmp) / "ticks.json"
    ticks.write_text(json.dumps({"arl_scout": {"ticks": [1.0], "label": "t"}}))
    video = pathlib.Path(tmp) / "clip.mp4"
    _write_fake_video(video)
    cli_args = [
        "--test_dataset", "arl_scout", "--model_preset", "tiny",
        "--llm_pretrained", ov, "--lora_pretrained", adapter,
        "--tokenizer_pretrained", ov,
        "--input_dir", str(video), "--output_fname", str(out_json),
        "--frame_fps", "1.0", "--tick_table", str(ticks),
    ]
    if run_cli_subprocess:
        # force the CPU backend IN CODE: a sitecustomize in this
        # environment pins the TPU tunnel backend before env vars are
        # consulted, so a plain `python -m aha_tpu.cli` would silently
        # compile the rehearsal on the chip (and contend with real
        # benches). The real-weights day drops the prefix.
        code = ("import sys, jax; jax.config.update('jax_platforms', 'cpu');"
                " from aha_tpu.cli import cmd_infer; cmd_infer(sys.argv[1:])")
        subprocess.run([sys.executable, "-c", code, *cli_args],
                       check=True, cwd="/root/repo")
    else:
        from aha_tpu.cli import cmd_infer

        cmd_infer(cli_args)
    data = json.loads(out_json.read_text())
    assert data["debug_data"], "CLI infer produced no score trace"
    assert all(np.isfinite(d["relevance_score"]) for d in data["debug_data"])
    report["cli_frames_scored"] = len(data["debug_data"])

    # the LoRA must actually act: scores with lora_scale=0 differ
    from aha_tpu.config import InferConfig
    from aha_tpu.streaming.session import StreamSession
    from aha_tpu.ops.kv_cache import CachePolicy
    from aha_tpu.streaming.engine import StreamEngine

    icfg = InferConfig(grounding_mode=True, frame_fps=1.0,
                       kv_cache_policy="sink", kv_window=64,
                       num_sink_tokens=4)
    frames = np.random.default_rng(0).integers(
        0, 255, (3, cfg.frame_resolution, cfg.frame_resolution, 3), np.uint8)

    def score(scale):
        eng = StreamEngine(params, cfg,
                           CachePolicy("sink", window=64, num_sink=4),
                           lora=lora, lora_scale=scale)
        sess = StreamSession(eng, tok, icfg)
        rows = sess.score_video(frames, query="what happens?")
        return np.asarray([[r["informative_score"], r["relevance_score"]]
                           for r in rows])
    s_on, s_off = score(lora_scale), score(0.0)
    assert not np.allclose(s_on, s_off), \
        "LoRA adapters had no effect on the score trace"
    report["lora_effect_max_delta"] = float(np.abs(s_on - s_off).max())

    # --- §3: fixture recording + drift replay --------------------------
    fx = pathlib.Path(tmp) / "golden_rehearsal.npz"
    script = str(pathlib.Path(__file__).parent / "make_golden_fixture.py")
    env_cmd = [sys.executable, script, "--mode", "aha", "--preset", "tiny",
               "--checkpoint", ov, "--out", str(fx)]
    subprocess.run(env_cmd, check=True, cwd="/root/repo")
    assert fx.exists()
    subprocess.run(env_cmd + ["--check"], check=True, cwd="/root/repo")
    rec = np.load(fx, allow_pickle=False)

    # --- §4: the parity-gate shape on the recorded traces --------------
    np.testing.assert_allclose(rec["scores_fused4"], rec["scores"],
                               atol=2e-2, rtol=5e-2)
    assert list(rec["gen_texts_seq"]) == list(rec["gen_texts_spec"]), \
        "speculative generation diverged from sequential on the rehearsal"
    report["fixture_frames"] = int(rec["scores"].shape[0])
    return report


def _write_fake_video(path, n_frames=12, fps=4.0, size=(64, 48)):
    import cv2

    out = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                          fps, size)
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        frame = np.full((size[1], size[0], 3), (i * 17) % 255, np.uint8)
        frame[:10, :10] = rng.integers(0, 255, (10, 10, 3))
        out.write(frame)
    out.release()


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    keep = "--keep" in sys.argv
    tmp = tempfile.mkdtemp(prefix="aha_rehearsal_")
    try:
        report = rehearse(tmp, run_cli_subprocess=True)
        print(json.dumps({"rehearsal": "PASS", **report}, indent=1))
    finally:
        if not keep:
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            print(f"artifacts kept at {tmp}")


if __name__ == "__main__":
    main()
