"""Training stack tests: loss parity vs a torch oracle of the reference
formula, trainable-parameter partition, end-to-end overfit on a tiny model,
and FSDP-sharded steps on the fake 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.config import LossWeights, TrainConfig, aha_tiny
from aha_tpu.models import aha
from aha_tpu.parallel import mesh as mesh_lib
from aha_tpu.train import lora as lora_lib
from aha_tpu.train.losses import IGNORE, aha_loss
from aha_tpu.train.trainer import (
    init_train_state,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)


# ---------------------------------------------------------------------------
# Loss parity vs torch oracle (reference formula re-derivation,
# video_head_live_llava_qwen.py:185-281)
# ---------------------------------------------------------------------------


def torch_oracle_loss(logits, info_logits, relevance, log_var, input_ids,
                      labels, info_labels, rel_labels, w: LossWeights):
    import math

    import torch
    import torch.nn as nn

    logits = torch.tensor(np.asarray(logits))
    info_logits = torch.tensor(np.asarray(info_logits))
    relevance_logits = torch.tensor(np.asarray(relevance))
    log_variance = torch.tensor(np.asarray(log_var))
    input_ids = torch.tensor(np.asarray(input_ids))
    ce = nn.CrossEntropyLoss(ignore_index=-100)
    sl1 = nn.SmoothL1Loss()

    lm_loss = torch.tensor(0.0)
    if labels is not None:
        labels = torch.tensor(np.asarray(labels)).clone()
        if not (labels != -100).any():
            labels[:, 0] = input_ids[:, 1]
        lm_loss = ce(logits.flatten(0, 1), labels.flatten())

    info_loss = torch.tensor(0.0)
    if info_labels is not None:
        info_labels = torch.tensor(np.asarray(info_labels)).clone()
        if not (info_labels != -100).any():
            info_labels[:, 0] = 0
        info_loss = ce(info_logits.flatten(0, 1), info_labels.flatten())

    ref_loss = tv_loss = unc_loss = torch.tensor(0.0)
    if rel_labels is not None:
        rel_labels = torch.tensor(np.asarray(rel_labels)).clone()
        if not (rel_labels != -100).any():
            rel_labels[:, 0] = 0
        valid = rel_labels != -100
        if relevance_logits.shape[1] > 1:
            tv_mask = valid[:, 1:]
            tv_scalar = torch.mean((relevance_logits[:, 1:] - relevance_logits[:, :-1]) ** 2)
            tv_loss = (tv_mask * tv_scalar).sum() / (tv_mask.sum() + 1e-6)
        rv = relevance_logits.flatten().float()[valid.flatten()]
        rl = rel_labels.flatten().float()[valid.flatten()]
        if rl.numel() > 1:
            ref_loss = sl1(rv, rl)
        # verbatim reference shapes (video_head_live_llava_qwen.py:256-266):
        # log_variance keeps its trailing head dim [B, T, 1], so
        # variance_valid is [n, 1] and the nll broadcasts against the [n]
        # residual into an [n, n] outer matrix whose mean pairs every
        # variance with the mean squared residual
        lv = torch.clamp(log_variance.unsqueeze(-1), min=-4.0, max=1.5)
        var = torch.exp(lv)
        var_valid = var.flatten(0, 1)[valid.flatten()]          # [n, 1]
        nll = ((rl - rv) ** 2) / (2 * var_valid + 1e-6) + 0.5 * torch.log(2 * math.pi * var_valid)
        assert nll.dim() == 2 and nll.shape[0] == nll.shape[1]  # the quirk
        unc_loss = nll.mean() - 1e-3 * torch.std(lv)
        unc_loss = torch.clamp(unc_loss, min=0)

    video = w.info * info_loss + w.relevance * (ref_loss + w.tv * tv_loss) + w.uncertainty * unc_loss
    total = w.lm * lm_loss + w.video * video
    return float(total), float(lm_loss), float(info_loss), float(ref_loss), float(tv_loss), float(unc_loss)


@pytest.mark.parametrize("case", ["full", "no_rel", "no_info", "empty_labels", "one_rel"])
def test_loss_matches_torch_oracle(case):
    rng = np.random.default_rng(hash(case) % 2**31)
    B, T, V = 2, 24, 50
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    info_logits = rng.normal(size=(B, T, 2)).astype(np.float32)
    relevance = (1 / (1 + np.exp(-rng.normal(size=(B, T))))).astype(np.float32)
    log_var = rng.normal(size=(B, T)).astype(np.float32) * 2
    input_ids = rng.integers(0, V, (B, T))

    labels = rng.integers(0, V, (B, T))
    labels[rng.random((B, T)) < 0.6] = IGNORE
    info_labels = rng.integers(0, 2, (B, T))
    info_labels[rng.random((B, T)) < 0.5] = IGNORE
    rel_labels = rng.random((B, T)).astype(np.float32)
    rel_labels[rng.random((B, T)) < 0.5] = IGNORE

    if case == "no_rel":
        rel_labels = None
    elif case == "no_info":
        info_labels = None
    elif case == "empty_labels":
        labels = np.full((B, T), IGNORE)
        info_labels = np.full((B, T), IGNORE)
        rel_labels = np.full((B, T), float(IGNORE), np.float32)
    elif case == "one_rel":
        rel_labels = np.full((B, T), float(IGNORE), np.float32)
        rel_labels[0, 3] = 0.7  # exactly one valid -> SmoothL1 skipped

    w = LossWeights()
    parts = aha_loss(
        jnp.asarray(logits), jnp.asarray(info_logits), jnp.asarray(relevance),
        jnp.asarray(log_var),
        input_ids=jnp.asarray(input_ids),
        labels=None if labels is None else jnp.asarray(labels),
        informative_labels=None if info_labels is None else jnp.asarray(info_labels),
        relevance_labels=None if rel_labels is None else jnp.asarray(rel_labels),
        weights=w,
    )
    want = torch_oracle_loss(logits, info_logits, relevance, log_var, input_ids,
                             labels, info_labels, rel_labels, w)
    np.testing.assert_allclose(float(parts.total), want[0], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(parts.lm), want[1], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(parts.info), want[2], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(parts.relevance), want[3], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(parts.tv), want[4], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(parts.uncertainty), want[5], rtol=2e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Trainable partition + LoRA
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def _tiny_shared():
    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=1)
    return params, cfg, tok


@pytest.fixture()
def tiny(_tiny_shared):
    # the donated train step consumes its input buffers; hand each test a copy
    params, cfg, tok = _tiny_shared
    return jax.tree_util.tree_map(jnp.array, params), cfg, tok


def test_trainable_labels_partition(tiny):
    params, cfg, _ = tiny
    lora_tree = lora_lib.init_lora(cfg.llm, TrainConfig().lora, jax.random.PRNGKey(0))
    labels = lora_lib.trainable_labels(params, lora_tree, TrainConfig().lora.finetune_modules)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    path_to_label = {
        "/".join(str(getattr(p, "key", p)) for p in path): l for path, l in flat
    }
    assert all(v == "train" for k, v in path_to_label.items() if k.startswith("lora/"))
    assert all(v == "freeze" for k, v in path_to_label.items() if "vision" in k)
    assert all(v == "freeze" for k, v in path_to_label.items()
               if "model/llm/layers" in k or "model/llm/embed" in k)
    assert path_to_label["model/llm/lm_head/kernel"] == "train"
    assert path_to_label["model/projector/fc1/kernel"] == "train"
    assert path_to_label["model/heads/relevance/kernel"] == "train"


def test_lora_zero_init_and_merge(tiny):
    params, cfg, _ = tiny
    lora_tree = lora_lib.init_lora(cfg.llm, TrainConfig().lora, jax.random.PRNGKey(0))
    # b = 0 -> merge is identity
    merged = lora_lib.merge_lora(params["llm"], lora_tree, 2.0)
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["q_proj"]["kernel"]),
        np.asarray(params["llm"]["layers"]["q_proj"]["kernel"]),
    )
    # nonzero b: merged forward == lora-applied forward
    lora_tree = jax.tree_util.tree_map(lambda x: x + 0.01, lora_tree)
    from aha_tpu.models import qwen2

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, cfg.llm.hidden_size), jnp.float32)
    h_lora = qwen2.forward_hidden(params["llm"], cfg.llm, x, lora=lora_tree, lora_scale=2.0)
    merged = lora_lib.merge_lora(params["llm"], lora_tree, 2.0)
    h_merged = qwen2.forward_hidden(merged, cfg.llm, x)
    np.testing.assert_allclose(np.asarray(h_lora), np.asarray(h_merged), rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# End-to-end training steps
# ---------------------------------------------------------------------------


def make_batch(cfg, tok, rng, B=2, n_frames=3):
    F = cfg.frame_num_tokens
    text_ids = []
    for _ in range(B):
        conv = [
            {"role": "system", "content": "sys"},
            {"role": "stream", "num_frames": n_frames, "learn": True},
            {"role": "assistant", "content": "ok!", "learn": True},
        ]
        text_ids.append(tok.apply_chat_template(conv))
    T = max(len(x) for x in text_ids)
    input_ids = np.zeros((B, T), np.int32)
    attn = np.zeros((B, T), bool)
    for i, ids in enumerate(text_ids):
        input_ids[i, T - len(ids):] = ids  # left pad
        attn[i, T - len(ids):] = True
    labels = np.full((B, T), IGNORE, np.int64)
    labels[:, :-1] = np.where(attn[:, 1:], input_ids[:, 1:], IGNORE)
    info_labels = np.full((B, T), IGNORE, np.int64)
    rel_labels = np.full((B, T), float(IGNORE), np.float32)
    ph = input_ids == cfg.v_placeholder_id
    for i in range(B):
        idx = np.where(ph[i])[0][F - 1 :: F]
        info_labels[i, idx] = rng.integers(0, 2, len(idx))
        rel_labels[i, idx] = rng.random(len(idx))
    r = cfg.frame_resolution
    frames = rng.integers(0, 255, (B * n_frames, r, r, 3)).astype(np.uint8)
    return {
        "input_ids": input_ids, "attention_mask": attn, "labels": labels,
        "informative_labels": info_labels, "relevance_labels": rel_labels,
        "frames": frames,
    }


@pytest.mark.slow
def test_overfit_tiny(tiny):
    params, cfg, tok = tiny
    rng = np.random.default_rng(0)
    train_cfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=1, warmup_ratio=0.0)
    state, tx, labels, scale = init_train_state(cfg, train_cfg, params, total_steps=30)
    step_fn = make_train_step(cfg, train_cfg, tx, labels, scale)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, tok, rng).items()}
    losses = []
    frozen_before = np.asarray(state.tree["model"]["llm"]["layers"]["q_proj"]["kernel"])
    embed_before = np.asarray(state.tree["model"]["llm"]["embed"]["weight"])
    for _ in range(30):
        state, parts = step_fn(state, batch)
        losses.append(float(parts.total))
    assert losses[-1] < losses[0] * 0.8, losses
    # frozen base stays exactly put; adapters move
    np.testing.assert_array_equal(
        np.asarray(state.tree["model"]["llm"]["layers"]["q_proj"]["kernel"]), frozen_before
    )
    np.testing.assert_array_equal(
        np.asarray(state.tree["model"]["llm"]["embed"]["weight"]), embed_before
    )
    assert np.abs(np.asarray(state.tree["lora"]["q_proj"]["b"])).max() > 0


@pytest.mark.slow
def test_qlora_int8_base_train_step(tiny):
    """QLoRA analog (ref NF4+LoRA, modeling_live.py:114-133,148-168): LoRA
    fine-tuning over a frozen int8-quantized base. The train step must never
    put the integer leaves in grad position; the quantized trunk stays
    bit-identical while adapters + dense finetune modules learn."""
    from aha_tpu.ops.quant import quantize_params

    params, cfg, tok = tiny
    qparams = quantize_params(params, keep_dense=("projector", "lm_head"))
    # finetune modules stayed dense (trainable), trunk is quantized
    assert isinstance(qparams["llm"]["layers"]["q_proj"]["kernel"], dict)
    assert not isinstance(qparams["llm"]["lm_head"]["kernel"], dict)
    assert not isinstance(qparams["projector"]["fc1"]["kernel"], dict)

    rng = np.random.default_rng(3)
    train_cfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=1, warmup_ratio=0.0)
    state, tx, labels, scale = init_train_state(cfg, train_cfg, qparams, total_steps=20)
    step_fn = make_train_step(cfg, train_cfg, tx, labels, scale)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, tok, rng).items()}
    q_before = np.asarray(state.tree["model"]["llm"]["layers"]["q_proj"]["kernel"]["qvalue"])
    losses = []
    for _ in range(20):
        state, parts = step_fn(state, batch)
        losses.append(float(parts.total))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.9, losses
    np.testing.assert_array_equal(
        np.asarray(state.tree["model"]["llm"]["layers"]["q_proj"]["kernel"]["qvalue"]),
        q_before)
    assert np.abs(np.asarray(state.tree["lora"]["q_proj"]["b"])).max() > 0


@pytest.mark.slow
def test_qlora_int4_base_train_step(tiny):
    """int4 QLoRA: LoRA fine-tuning over a frozen PACKED-int4 trunk (the
    ref NF4 bitwidth — beyond the ref, whose 4-bit path is inference-only,
    modeling_live.py:114-133). On CPU this routes through the dequant
    einsum backward; on TPU the fused kernel's custom VJP
    (ops/pallas/fused_matmul.int4_qlinear) carries the same math."""
    from aha_tpu.ops.quant import quantize_params

    params, cfg, tok = tiny
    qparams = quantize_params(params, keep_dense=("projector", "lm_head"),
                              bits=4)
    assert "q4value" in qparams["llm"]["layers"]["q_proj"]["kernel"]

    rng = np.random.default_rng(5)
    train_cfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=1,
                            warmup_ratio=0.0)
    state, tx, labels, scale = init_train_state(cfg, train_cfg, qparams,
                                                total_steps=20)
    step_fn = make_train_step(cfg, train_cfg, tx, labels, scale)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, tok, rng).items()}
    q_before = np.asarray(
        state.tree["model"]["llm"]["layers"]["q_proj"]["kernel"]["q4value"])
    losses = []
    for _ in range(20):
        state, parts = step_fn(state, batch)
        losses.append(float(parts.total))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.9, losses
    np.testing.assert_array_equal(
        np.asarray(
            state.tree["model"]["llm"]["layers"]["q_proj"]["kernel"]["q4value"]),
        q_before)
    assert np.abs(np.asarray(state.tree["lora"]["q_proj"]["b"])).max() > 0


def test_lora_train_step_bf16_activations():
    """bf16 model dtype (the 7B deployment config) with f32 LoRA masters:
    the f32 adapter delta must cast back to bf16 or the decoder scan carry
    changes dtype mid-scan (regression: 7B QLoRA on-chip)."""
    from aha_tpu.ops.quant import quantize_params

    cfg = aha_tiny(vocab_size=128).replace(dtype="bfloat16")
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=1)
    qparams = quantize_params(params, keep_dense=("projector", "lm_head"))
    train_cfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=1, warmup_ratio=0.0)
    state, tx, labels, scale = init_train_state(cfg, train_cfg, qparams, total_steps=5)
    step_fn = make_train_step(cfg, train_cfg, tx, labels, scale)
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(cfg, tok, np.random.default_rng(7)).items()}
    state, parts = step_fn(state, batch)
    assert np.isfinite(float(parts.total))


@pytest.mark.slow
def test_qlora_fsdp_step_matches_single_device(tiny):
    """QLoRA + FSDP: the int8 trunk shards like its dense counterpart
    (mesh.spec_for quantized-leaf rules) and the sharded step's loss equals
    the single-device step's."""
    from aha_tpu.ops.quant import quantize_params

    params, cfg, tok = tiny
    rng = np.random.default_rng(5)
    train_cfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=1, warmup_ratio=0.0)
    batch_np = make_batch(cfg, tok, rng, B=4, n_frames=2)
    qparams = quantize_params(params, keep_dense=("projector", "lm_head"))

    q1 = jax.tree_util.tree_map(jnp.array, qparams)
    state1, tx, labels, scale = init_train_state(cfg, train_cfg, q1, total_steps=10)
    step1 = make_train_step(cfg, train_cfg, tx, labels, scale)
    _, parts1 = step1(state1, {k: jnp.asarray(v) for k, v in batch_np.items()})

    m = mesh_lib.make_mesh(4, 2)
    state2, tx2, labels2, scale2 = init_train_state(cfg, train_cfg, qparams, total_steps=10)
    tree = mesh_lib.apply_named_sharding(state2.tree, m)
    state2 = type(state2)(tree=tree, opt_state=tx2.init(tree), step=state2.step)
    step2 = make_train_step(cfg, train_cfg, tx2, labels2, scale2)
    batch = mesh_lib.shard_batch(batch_np, m)
    state2, parts2 = step2(state2, batch)
    np.testing.assert_allclose(float(parts1.total), float(parts2.total), rtol=5e-4)


@pytest.mark.slow
def test_fsdp_step_matches_single_device(tiny):
    params, cfg, tok = tiny
    rng = np.random.default_rng(1)
    train_cfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=1, warmup_ratio=0.0)
    batch_np = make_batch(cfg, tok, rng, B=4, n_frames=2)

    # single device (on a copy: the donated step consumes its inputs)
    params1 = jax.tree_util.tree_map(jnp.array, params)
    state1, tx, labels, scale = init_train_state(cfg, train_cfg, params1, total_steps=10)
    step1 = make_train_step(cfg, train_cfg, tx, labels, scale)
    _, parts1 = step1(state1, {k: jnp.asarray(v) for k, v in batch_np.items()})

    # 4x2 mesh (data=4, model=2) with sharded params + batch
    m = mesh_lib.make_mesh(4, 2)
    state2, tx2, labels2, scale2 = init_train_state(cfg, train_cfg, params, total_steps=10)
    tree = mesh_lib.apply_named_sharding(state2.tree, m)
    state2 = type(state2)(tree=tree, opt_state=tx2.init(tree), step=state2.step)
    step2 = make_train_step(cfg, train_cfg, tx2, labels2, scale2)
    batch = mesh_lib.shard_batch(batch_np, m)
    state2, parts2 = step2(state2, batch)
    np.testing.assert_allclose(float(parts1.total), float(parts2.total), rtol=5e-4)


@pytest.mark.slow
def test_checkpoint_roundtrip(tiny, tmp_path):
    params, cfg, tok = tiny
    train_cfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=1)
    state, tx, labels, scale = init_train_state(cfg, train_cfg, params, total_steps=5)
    step_fn = make_train_step(cfg, train_cfg, tx, labels, scale)
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(cfg, tok, np.random.default_rng(2)).items()}
    state, _ = step_fn(state, batch)
    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    fresh, *_ = init_train_state(cfg, train_cfg, params, total_steps=5)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 1
    np.testing.assert_allclose(
        np.asarray(restored.tree["lora"]["q_proj"]["b"]),
        np.asarray(state.tree["lora"]["q_proj"]["b"]),
    )
    # the end-of-run save collides with an in-loop save at the same step
    # whenever total_steps % save_steps == 0 (orbax refuses to overwrite —
    # found by the round-4 on-chip 7B e2e run); must be a no-op, not a raise
    assert save_checkpoint(str(tmp_path / "ckpt"), state) == path

    # trained-only format (labels=): restores trained leaves + opt + step,
    # keeps the frozen trunk from the live tree (7B resume memory fix —
    # a full-tree restore holds two trunks and OOMs a 16 GB chip)
    path_t = save_checkpoint(str(tmp_path / "ckpt_t"), state, labels=labels)
    fresh2, *_ = init_train_state(cfg, train_cfg, params, total_steps=5)
    restored_t = restore_checkpoint(path_t, fresh2, labels)
    assert int(restored_t.step) == 1
    np.testing.assert_allclose(
        np.asarray(restored_t.tree["lora"]["q_proj"]["b"]),
        np.asarray(state.tree["lora"]["q_proj"]["b"]))
    # frozen leaves come from the live tree, not the checkpoint
    q_frozen = fresh2.tree["model"]["llm"]["layers"]["q_proj"]["kernel"]
    assert restored_t.tree["model"]["llm"]["layers"]["q_proj"]["kernel"] is q_frozen
    # trained non-lora leaves (e.g. lm_head / projector) restored too
    np.testing.assert_allclose(
        np.asarray(restored_t.tree["model"]["projector"]["fc1"]["kernel"]),
        np.asarray(state.tree["model"]["projector"]["fc1"]["kernel"]))


def test_lora_dropout_and_target_patterns():
    """LoRA dropout (ref peft lora_dropout=0.05) + target_patterns regex
    (ref lora_modules): dropout perturbs the train-time forward only and is
    deterministic in the rng; the regex selects which projections get
    adapters."""
    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=1)
    lcfg = TrainConfig().lora
    lora_tree = lora_lib.init_lora(cfg.llm, lcfg, jax.random.PRNGKey(0))
    assert set(lora_tree) == set(lora_lib.LORA_PROJS)
    # restrict to attention projections only
    import dataclasses as _dc
    narrow = _dc.replace(lcfg, target_patterns=r"layers_\d+/(q_proj|v_proj)/kernel")
    assert set(lora_lib.init_lora(cfg.llm, narrow, jax.random.PRNGKey(0))) == \
        {"q_proj", "v_proj"}

    from aha_tpu.models import qwen2

    # nonzero adapters so dropout visibly changes the output
    lora_tree = jax.tree_util.tree_map(lambda x: x + 0.01, lora_tree)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, cfg.llm.hidden_size),
                          jnp.float32)
    h_eval = qwen2.forward_hidden(params["llm"], cfg.llm, x,
                                  lora=lora_tree, lora_scale=2.0)
    rng = jax.random.PRNGKey(9)
    h_drop = qwen2.forward_hidden(params["llm"], cfg.llm, x, lora=lora_tree,
                                  lora_scale=2.0, lora_dropout=0.5,
                                  dropout_rng=rng)
    h_drop2 = qwen2.forward_hidden(params["llm"], cfg.llm, x, lora=lora_tree,
                                   lora_scale=2.0, lora_dropout=0.5,
                                   dropout_rng=rng)
    h_drop3 = qwen2.forward_hidden(params["llm"], cfg.llm, x, lora=lora_tree,
                                   lora_scale=2.0, lora_dropout=0.5,
                                   dropout_rng=jax.random.PRNGKey(10))
    assert np.abs(np.asarray(h_drop - h_eval)).max() > 1e-5   # masks applied
    np.testing.assert_array_equal(np.asarray(h_drop), np.asarray(h_drop2))
    assert np.abs(np.asarray(h_drop - h_drop3)).max() > 1e-6  # rng-dependent
    # no rng -> dropout disabled even with a rate (the eval path)
    h_no_rng = qwen2.forward_hidden(params["llm"], cfg.llm, x, lora=lora_tree,
                                    lora_scale=2.0, lora_dropout=0.5)
    np.testing.assert_array_equal(np.asarray(h_no_rng), np.asarray(h_eval))


def test_train_continues_from_adapter(tiny):
    """Fine-tune continuation (ref README continuation, adapters reloaded
    via PeftModel): init_train_state(lora_init=...) seeds the LoRA state
    from an existing tree instead of fresh-initializing."""
    params, cfg, tok = tiny
    seed_tree = lora_lib.init_lora(cfg.llm, TrainConfig().lora,
                                   jax.random.PRNGKey(3))
    seed_tree = jax.tree_util.tree_map(lambda x: x + 0.25, seed_tree)
    state, *_ = init_train_state(cfg, TrainConfig(), params, total_steps=5,
                                 lora_init=seed_tree)
    np.testing.assert_array_equal(
        np.asarray(state.tree["lora"]["q_proj"]["b"]),
        np.asarray(seed_tree["q_proj"]["b"]))


def test_video_head_stop_grad(tiny):
    """AhaConfig.video_head_stop_grad detaches hidden states before the three
    score heads (ref video_head_live_llava_qwen.py:44-47,180-184): video
    losses then produce zero gradient in the trunk while the head kernels
    still train; the LM path is unaffected."""
    params, cfg, tok = tiny
    B, T = 1, 8
    rng = np.random.default_rng(0)
    input_ids = jnp.asarray(rng.integers(0, 100, (B, T)), jnp.int32)
    info_labels = jnp.asarray(rng.integers(0, 2, (B, T)), jnp.int32)
    rel_labels = jnp.asarray(rng.random((B, T)), jnp.float32)

    def video_loss(p, c):
        out = aha.forward_train(p, c, input_ids, None, remat=False)
        parts = aha_loss(
            logits=out.logits, informative_logits=out.informative_logits,
            relevance=out.relevance, log_variance=out.log_variance,
            input_ids=input_ids, labels=jnp.full((B, T), IGNORE, jnp.int32),
            informative_labels=info_labels, relevance_labels=rel_labels,
            weights=LossWeights())
        return parts.total

    for flag in (False, True):
        c = cfg.replace(video_head_stop_grad=flag, dtype="float32")
        grads = jax.grad(video_loss)(params, c)
        trunk = float(jnp.abs(grads["llm"]["layers"]["q_proj"]["kernel"]).sum())
        head = float(jnp.abs(grads["heads"]["relevance"]["kernel"]).sum())
        assert head > 0, flag
        if flag:
            assert trunk == 0.0
        else:
            assert trunk > 0.0


def test_remat_policies_equivalent(tiny):
    """TrainConfig.remat_policy only changes what the backward pass saves vs
    recomputes (qwen2.forward_hidden); the math is identical, so one train
    step under each policy must produce the same loss and the same updated
    adapters. Replaces the reference's single gradient_checkpointing bool
    with XLA checkpoint policies (jax.checkpoint_policies)."""
    params, cfg, tok = tiny
    rng = np.random.default_rng(3)
    batch_np = make_batch(cfg, tok, rng)
    results = {}
    for policy in ("none", "full", "half", "dots"):
        train_cfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=1,
                                warmup_ratio=0.0, remat_policy=policy)
        p = jax.tree_util.tree_map(jnp.array, params)
        state, tx, labels, scale = init_train_state(
            cfg, train_cfg, p, total_steps=5)
        step_fn = make_train_step(cfg, train_cfg, tx, labels, scale)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, parts = step_fn(state, batch)
        results[policy] = (float(parts.total),
                           np.asarray(state.tree["lora"]["q_proj"]["b"]))
    ref_loss, ref_b = results["none"]
    for policy in ("full", "half", "dots"):
        loss, b = results[policy]
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-6)
        np.testing.assert_allclose(b, ref_b, rtol=1e-5, atol=1e-7)
