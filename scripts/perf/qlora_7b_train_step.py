"""7B QLoRA train-step on one v5e-1 (16 GB): does it fit, and how fast?

LoRA r16/a32 over a frozen int8 trunk (projector/lm_head/heads dense,
trained — the full reference finetune_modules set). Run on the TPU:
    python scripts/perf/qlora_7b_train_step.py
(One TPU process at a time; timing synced with jax.device_get.)

Measured 2026-08-16, v5e-1 via axon tunnel (median of 5 warm steps):
    B=1 T=534 (8 frames):  252.6 ms/step,  2114 tok/s  (compile 230 s)
    B=1 T=926 (16 frames): 390.4 ms/step,  2372 tok/s  (~50% bf16 MFU)
The reference's training floor is >=48 GB/GPU (README.md:111); its NF4
4-bit path is inference-only (modeling_live.py:114-133).
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.config import TrainConfig, aha_7b
from aha_tpu.models.aha import init_aha_params
from aha_tpu.ops import quant
from aha_tpu.tokenization import build_stream_tokenizer
from aha_tpu.train.trainer import init_train_state, make_train_step

IGNORE = -100


def random_qlora_params(cfg):
    """Leaf-wise on-device materialization (full bf16 7B won't fit 16 GB)."""
    struct = jax.eval_shape(lambda: init_aha_params(cfg, jax.random.PRNGKey(0)))
    struct = jax.eval_shape(
        lambda p: quant.quantize_params(p, keep_dense=("projector", "lm_head")),
        struct)
    counter = [0]

    def materialize(path, leaf):
        counter[0] += 1
        key = jax.random.PRNGKey(counter[0])
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if leaf.dtype == jnp.int8:
            make = jax.jit(lambda k: jax.random.randint(
                k, leaf.shape, -127, 128, jnp.int32).astype(jnp.int8))
            return make(key)
        if name.endswith("/scale") and "norm" not in name and "ln" not in name:
            return jnp.full(leaf.shape, 0.02 / 127.0, leaf.dtype)
        if "norm" in name or "post_ln" in name or "/ln1/" in name or "/ln2/" in name:
            return jnp.ones(leaf.shape, leaf.dtype)
        if name.endswith("/bias"):
            return jnp.zeros(leaf.shape, leaf.dtype)
        make = jax.jit(lambda k: (0.02 * jax.random.normal(k, leaf.shape)).astype(leaf.dtype))
        return make(key)

    return jax.tree_util.tree_map_with_path(materialize, struct)


def make_batch(cfg, tok, rng, B, n_frames):
    F = cfg.frame_num_tokens
    conv = [
        {"role": "system", "content": "A multimodal AI assistant watches a stream."},
        {"role": "user", "content": "narrate the key moments"},
        {"role": "stream", "num_frames": n_frames, "learn": True},
        {"role": "assistant", "content": "the subject moves through the scene.", "learn": True},
    ]
    ids = tok.apply_chat_template(conv)
    T = len(ids)
    input_ids = np.tile(np.asarray(ids, np.int32), (B, 1))
    attn = np.ones((B, T), bool)
    labels = np.full((B, T), IGNORE, np.int64)
    labels[:, :-1] = np.where(attn[:, 1:], input_ids[:, 1:], IGNORE)
    info_labels = np.full((B, T), IGNORE, np.int64)
    rel_labels = np.full((B, T), float(IGNORE), np.float32)
    ph = input_ids == cfg.v_placeholder_id
    for i in range(B):
        idx = np.where(ph[i])[0][F - 1::F]
        info_labels[i, idx] = rng.integers(0, 2, len(idx))
        rel_labels[i, idx] = rng.random(len(idx))
    r = cfg.frame_resolution
    frames = rng.integers(0, 255, (B * n_frames, r, r, 3)).astype(np.uint8)
    return {
        "input_ids": input_ids, "attention_mask": attn, "labels": labels,
        "informative_labels": info_labels, "relevance_labels": rel_labels,
        "frames": frames,
    }, T


def hbm_gb():
    try:
        s = jax.local_devices()[0].memory_stats()
        return round(s.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        return None


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    cfg = aha_7b().replace(dtype="bfloat16")
    tok = build_stream_tokenizer(frame_num_tokens=cfg.frame_num_tokens,
                                 vocab_size=cfg.llm.vocab_size)
    cfg = cfg.replace(v_placeholder_id=tok.v_placeholder_id,
                      eos_token_id=tok.eos_token_id)
    t0 = time.time()
    params = random_qlora_params(cfg)
    print(f"params materialized in {time.time()-t0:.1f}s, "
          f"{quant.tree_nbytes(params)/2**30:.2f} GiB, peak HBM {hbm_gb()} GiB",
          flush=True)

    results = {}
    train_cfg = TrainConfig(learning_rate=1e-4, grad_accum_steps=1, warmup_ratio=0.0)
    state, tx, labels_tree, scale = init_train_state(
        cfg, train_cfg, params, total_steps=100)
    del params
    step_fn = make_train_step(cfg, train_cfg, tx, labels_tree, scale)
    print(f"state init ok, peak HBM {hbm_gb()} GiB", flush=True)

    rng = np.random.default_rng(0)
    for B, n_frames in [(1, 8), (1, 16)]:
        batch_np, T = make_batch(cfg, tok, rng, B, n_frames)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        t0 = time.time()
        state, parts = step_fn(state, batch)
        loss0 = float(jax.device_get(parts.total))
        compile_s = time.time() - t0
        print(f"B={B} T={T}: first step (compile) {compile_s:.1f}s "
              f"loss={loss0:.3f} peak HBM {hbm_gb()} GiB", flush=True)
        times = []
        for _ in range(5):
            t0 = time.time()
            state, parts = step_fn(state, batch)
            loss = float(jax.device_get(parts.total))  # forces full sync
            times.append(time.time() - t0)
        med = float(np.median(times))
        results[f"B{B}_T{T}"] = {
            "step_ms": round(med * 1000, 1),
            "tokens_per_sec": round(B * T / med, 1),
            "spread_ms": [round(min(times) * 1e3, 1), round(max(times) * 1e3, 1)],
            "compile_s": round(compile_s, 1),
            "peak_hbm_gib": hbm_gb(),
            "loss": round(loss, 4),
        }
        print(json.dumps({f"B{B}_T{T}": results[f"B{B}_T{T}"]}), flush=True)

    with open("/tmp/qlora_7b_result.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
