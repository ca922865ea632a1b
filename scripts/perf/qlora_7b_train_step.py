"""7B QLoRA train-step MFU sweep on one v5e-1 (16 GB).

LoRA r16/a32 over a frozen int8 trunk (projector/lm_head/heads dense,
trained — the full reference finetune_modules set). Sweeps batch shape
(B, n_frames) x remat policy (TrainConfig.remat_policy) and reports an
MFU table. Run on the TPU:
    python scripts/perf/qlora_7b_train_step.py [--quick]
(One TPU process at a time; timing synced with jax.device_get.)

MFU accounting (documented so the table is auditable):
  F_fwd       = analytic matmul FLOPs of one forward (trunk + lm_head +
                vision tower + projector + heads; causal attention counted
                at T/2 average context).
  useful/step = 2*F_fwd + F_dW    (forward + full dL/dx backward + dL/dW
                only for the trainable leaves — the frozen trunk has no
                weight-gradient matmuls in this step)
  hardware    = useful + F_fwd recomputed under remat_policy=full
                (policy "dots"/"none" recompute ~nothing that is a matmul)
  MFU = useful / step_time / PEAK;  HFU = hardware / step_time / PEAK
  PEAK = 197e12 (v5e bf16). The int8 trunk matmuls run through dequant to
  bf16 (weight-only quant), so bf16 peak is the right denominator.

Measured 2026-08-16 (pre-sweep, remat=full), v5e-1 via axon tunnel,
median of 5 warm steps:
    B=1 T=534 (8 frames):  252.6 ms/step,  2114 tok/s  (compile 230 s)
    B=1 T=926 (16 frames): 390.4 ms/step,  2372 tok/s
The reference's training floor is >=48 GB/GPU (README.md:111); its NF4
4-bit path is inference-only (modeling_live.py:114-133).
Sweep results are appended to BASELINE.md's MFU table when captured.
"""
import dataclasses
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
PEAK_BF16 = 197e12  # v5e per-chip bf16


def analytic_flops(cfg, B, T, n_frames):
    """Matmul FLOPs (multiply-accumulate counted as 2) of one forward, plus
    the dL/dW term for the trainable leaves. Elementwise/norm/softmax FLOPs
    are excluded (noise next to the matmuls at these shapes)."""
    l = cfg.llm
    # trunk, per layer: qkv + o projections, then causal attention at T/2
    proj = 2 * l.hidden_size * (2 * l.num_heads * l.head_dim
                                + 2 * l.num_kv_heads * l.head_dim)
    attn = 2 * 2 * (T / 2) * l.num_heads * l.head_dim
    mlp = 3 * 2 * l.hidden_size * l.intermediate_size
    trunk = l.num_layers * (proj + attn + mlp) * B * T
    lm_head = 2 * l.hidden_size * l.vocab_size * B * T
    heads = 3 * 2 * l.hidden_size * B * T  # info/rel/unc scalar heads
    v = cfg.vision
    P = v.num_patches
    v_proj = 2 * v.hidden_size * 4 * v.num_heads * (v.hidden_size // v.num_heads)
    v_attn = 2 * 2 * P * v.hidden_size
    v_mlp = 2 * 2 * v.hidden_size * v.intermediate_size
    v_patch = 2 * (v.patch_size ** 2 * 3) * v.hidden_size
    vision = B * n_frames * P * (v.num_layers * (v_proj + v_attn + v_mlp) + v_patch)
    projector = 2 * B * n_frames * cfg.frame_num_tokens * (
        v.hidden_size * l.hidden_size + l.hidden_size * l.hidden_size)
    fwd = trunk + lm_head + heads + vision + projector
    # dL/dW matmuls exist only for trainable leaves: lm_head, projector,
    # heads, and the LoRA adapters (rank-r, negligible at r=16)
    dW = lm_head + heads + projector
    return {"fwd": fwd, "dW": dW}


def random_qlora_params(cfg, bits=8):
    """Leaf-wise on-device materialization (full bf16 7B won't fit 16 GB)."""
    struct = jax.eval_shape(lambda: init_aha_params(cfg, jax.random.PRNGKey(0)))
    struct = jax.eval_shape(
        lambda p: quant.quantize_params(p, keep_dense=("projector", "lm_head"),
                                        bits=bits),
        struct)
    counter = [0]

    def materialize(path, leaf):
        counter[0] += 1
        key = jax.random.PRNGKey(counter[0])
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if leaf.dtype == jnp.uint8:  # packed int4 nibbles
            make = jax.jit(lambda k: jax.random.randint(
                k, leaf.shape, 0, 256, jnp.int32).astype(jnp.uint8))
            return make(key)
        if name.endswith("/scale4"):
            return jnp.full(leaf.shape, 0.02 / 7.0, leaf.dtype)
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


# (B, n_frames, remat_policy) — ordered cheap-compile-first; OOMs recorded
SWEEP = [
    (1, 16, "full"),
    (1, 16, "half"),
    (1, 16, "dots"),
    (2, 16, "full"),
    (4, 16, "full"),
    (1, 32, "full"),
    (2, 32, "full"),
    (2, 16, "dots"),
]
QUICK = [(1, 16, "full"), (2, 16, "full")]


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    quick = "--quick" in sys.argv
    tiny = "--tiny" in sys.argv  # CPU smoke test of the sweep harness
    if tiny:
        from aha_tpu.config import aha_tiny
        cfg = aha_tiny(vocab_size=512).replace(dtype="float32")
    else:
        cfg = aha_7b().replace(dtype="bfloat16")
    tok = build_stream_tokenizer(frame_num_tokens=cfg.frame_num_tokens,
                                 vocab_size=cfg.llm.vocab_size)
    cfg = cfg.replace(v_placeholder_id=tok.v_placeholder_id,
                      eos_token_id=tok.eos_token_id)
    bits = 4 if "--bits4" in sys.argv else 8  # int4 trunk (int4_qlinear VJP)
    t0 = time.time()
    params = random_qlora_params(cfg, bits=bits)
    print(f"params materialized in {time.time()-t0:.1f}s, "
          f"{quant.tree_nbytes(params)/2**30:.2f} GiB, peak HBM {hbm_gb()} GiB",
          flush=True)

    results = {}
    rng = np.random.default_rng(0)
    no_dropout = "--no_dropout" in sys.argv  # A/B the lora-dropout mask cost
    configs = QUICK if (quick or tiny) else SWEEP
    if no_dropout:
        configs = [(1, 16, "full")]
    if bits == 4:
        configs = [(1, 16, "full"), (1, 32, "full")]
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    if only:  # e.g. --only=1,16,full --only=1,16,half
        configs = []
        for spec in only:
            b, f, pol = spec.split(",")
            configs.append((int(b), int(f), pol))
    for B, n_frames, policy in configs:
        train_cfg = TrainConfig(learning_rate=1e-4, grad_accum_steps=1,
                                warmup_ratio=0.0, remat_policy=policy)
        if no_dropout:
            train_cfg = dataclasses.replace(
                train_cfg, lora=dataclasses.replace(train_cfg.lora, dropout=0.0))
        # the jitted step donates its input state, so the trunk buffers are
        # consumed on the first call — thread the returned (value-identical
        # for frozen leaves) tree forward into the next config's state
        state, tx, labels_tree, scale = init_train_state(
            cfg, train_cfg, params, total_steps=100)
        params = None
        step_fn = make_train_step(cfg, train_cfg, tx, labels_tree, scale)
        batch_np, T = make_batch(cfg, tok, rng, B, n_frames)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        key = f"B{B}_T{T}_{policy}"
        t0 = time.time()
        try:
            state, parts = step_fn(state, batch)
            loss0 = float(jax.device_get(parts.total))
        except Exception as e:  # RESOURCE_EXHAUSTED and friends
            msg = str(e).splitlines()[0][:200]
            print(f"{key}: FAILED {msg}", flush=True)
            results[key] = {"error": msg}
            del state
            params = random_qlora_params(cfg, bits=bits)  # donated buffers may be gone
            continue
        compile_s = time.time() - t0
        print(f"{key}: first step (compile) {compile_s:.1f}s "
              f"loss={loss0:.3f} peak HBM {hbm_gb()} GiB", flush=True)
        times = []
        for _ in range(5):
            t0 = time.time()
            state, parts = step_fn(state, batch)
            loss = float(jax.device_get(parts.total))  # forces full sync
            times.append(time.time() - t0)
        med = float(np.median(times))
        fl = analytic_flops(cfg, B, T, n_frames)
        useful = 2 * fl["fwd"] + fl["dW"]
        recompute = {"full": 1.0, "half": 0.5}.get(policy, 0.0)
        hardware = useful + recompute * fl["fwd"]
        results[key] = {
            "B": B, "T": T, "n_frames": n_frames, "remat": policy,
            "step_ms": round(med * 1000, 1),
            "tokens_per_sec": round(B * T / med, 1),
            "mfu": round(useful / med / PEAK_BF16, 3),
            "hfu": round(hardware / med / PEAK_BF16, 3),
            "spread_ms": [round(min(times) * 1e3, 1), round(max(times) * 1e3, 1)],
            "compile_s": round(compile_s, 1),
            "peak_hbm_gib": hbm_gb(),
            "loss": round(loss, 4),
        }
        print(json.dumps({key: results[key]}), flush=True)
        params = state.tree["model"]
        del state

    with open("/tmp/qlora_7b_result.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
