"""Composed end-to-end tiny-weight parity oracle (VERDICT r2 item #1).

Round 2 proved parity per-module; this file proves the COMPOSITION: the
whole chain template -> collate -> joint embed -> (cache) -> heads ->
trigger -> loss, run as one program on both sides with shared tiny
weights.

The torch side is assembled from the reference's own building blocks:

  * trunk: stock ``transformers.Qwen2ForCausalLM`` — the exact class the
    reference subclasses (video_head_live_llava_qwen.py:70-80), pinned
    at transformers==4.49.0 in the reference's requirements.txt;
  * three bias-free score heads + mlp2x_gelu projector + joint_embed
    scatter, replicated verbatim from video_head_live_llava_qwen.py:83-85
    and modeling_live.py:39-61;
  * the loss, replicated line-for-line from
    video_head_live_llava_qwen.py:190-281 (incl. the TV-scalar quirk and
    the [n, n] uncertainty-NLL broadcast quirk);
  * the reference's chat template + learn ranges, rendered through ITS
    jinja code from the read-only mount (via test_tokenization helpers);
  * the reference's actual collator ``data/data_collator.py`` imported by
    file path and driven with the same HF fast tokenizer;
  * the reference's streaming loop shape (test/inference.py:196-328) and
    its SinkCache (test/sink_cache.py) behind a 2-line compat shim for
    the installed transformers' mask plumbing.

The jax side consumes the SAME weights through models/loader.convert_*
and runs the production aha_tpu code (StreamTokenizer -> collate ->
forward_train + aha_loss; StreamSession.inference for streaming).

Everything here is slow-tier (--full).
"""

import importlib.util
import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from aha_tpu.config import InferConfig, LossWeights, aha_tiny
from aha_tpu.data.collator import collate
from aha_tpu.data.conversations import build_example
from aha_tpu.models import aha, loader
from aha_tpu.streaming.session import build_session
from aha_tpu.tokenization import BOS, EOS, TemplateConfig, build_stream_tokenizer
from aha_tpu.train.losses import aha_loss

import test_tokenization as tt

pytestmark = pytest.mark.slow

FRAME_TOKENS = 4
SYSTEM = "A multimodal AI assistant is helping users with some activities."


# ---------------------------------------------------------------------------
# Shared tiny tokenizer (real byte-level BPE, trained in-test — no network)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    corpus = [
        SYSTEM,
        "Below is their conversation, interleaved with the list of video frames.",
        "what is happening in the video? the person is cooking rice.",
        "describe the highlight of this clip please",
        "a rocket launch begins on the pad",
    ] * 20
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=600,
        special_tokens=[BOS, EOS, "<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token=BOS, eos_token=EOS,
        pad_token="<|endoftext|>")
    d = tmp_path_factory.mktemp("e2e_tok")
    fast.save_pretrained(str(d))
    return str(d)


def _ref_hf_tokenizer(bpe_dir):
    """The reference tokenizer setup (tokenization_live.py:115-124): HF fast
    tokenizer, left padding, <image> added as an additional special."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(bpe_dir, use_fast=True,
                                        padding_side="left",
                                        local_files_only=True)
    tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    return tok


# ---------------------------------------------------------------------------
# Torch reference twin (trunk = stock Qwen2ForCausalLM)
# ---------------------------------------------------------------------------


class TorchRefModel(torch.nn.Module):
    """The reference architecture at tiny scale: Qwen2 trunk + projector +
    3 bias-free heads + the exact multi-part loss
    (video_head_live_llava_qwen.py:70-96,138-281)."""

    def __init__(self, qcfg, vis_dim: int, v_placeholder_id: int):
        super().__init__()
        from transformers import Qwen2ForCausalLM

        self.lm = Qwen2ForCausalLM(qcfg)
        H = qcfg.hidden_size
        self.mm_projector = torch.nn.Sequential(
            torch.nn.Linear(vis_dim, H), torch.nn.GELU(), torch.nn.Linear(H, H))
        self.informative_head = torch.nn.Linear(H, 2, bias=False)
        self.relevance_head = torch.nn.Linear(H, 1, bias=False)
        self.uncertainty_head = torch.nn.Linear(H, 1, bias=False)
        self.v_placeholder_id = v_placeholder_id
        self.vocab_size = qcfg.vocab_size
        # ref :91-96
        self.lm_loss_weight = 0.2
        self.video_loss_weight = 1.0
        self.info_loss_weight = 0.5
        self.ref_loss_weight = 8.0
        self.uncertainty_loss_weight = 0.1
        self.tv_loss_weight = 0.05

    # modeling_live.py:31-37 with no vision tower: features go straight
    # through the projector (the tower itself is module-parity-tested)
    def visual_embed(self, feats):
        return self.mm_projector(feats).view(-1, self.mm_projector[2].out_features)

    # modeling_live.py:39-61 verbatim semantics
    def joint_embed(self, input_ids, feats=None):
        if feats is None:
            return self.lm.get_input_embeddings()(input_ids)
        inputs_embeds = self.lm.get_input_embeddings()(
            input_ids.clamp(max=self.vocab_size - 1))
        v_mask = input_ids == self.v_placeholder_id
        if v_mask.any():
            visual = self.visual_embed(feats).to(inputs_embeds.dtype)
            B, S, D = inputs_embeds.shape
            flat = inputs_embeds.view(-1, D).clone()
            flat[v_mask.view(-1)] = visual
            inputs_embeds = flat.view(B, S, D)
        return inputs_embeds

    def forward(self, input_ids=None, attention_mask=None, past_key_values=None,
                inputs_embeds=None, labels=None, informative_labels=None,
                relevance_labels=None, use_cache=None, frames=None):
        if inputs_embeds is None:
            inputs_embeds = self.joint_embed(input_ids, frames)
        outputs = self.lm.model(
            attention_mask=attention_mask, past_key_values=past_key_values,
            inputs_embeds=inputs_embeds, use_cache=use_cache, return_dict=True)
        hidden_states = outputs.last_hidden_state
        logits = self.lm.lm_head(hidden_states).float()

        hidden_states_no_grad = hidden_states           # stop_grad ablation off
        informative_logits = self.informative_head(hidden_states_no_grad).float()
        relevance_logits = self.relevance_head(hidden_states_no_grad).float()
        relevance_logits = torch.sigmoid(relevance_logits)
        log_variance = self.uncertainty_head(hidden_states_no_grad).float()

        # ---- loss, verbatim ref :190-281 --------------------------------
        ce_loss_fct = torch.nn.CrossEntropyLoss(ignore_index=-100)
        rel_loss_fct = torch.nn.SmoothL1Loss()
        if labels is not None:
            if not (labels != -100).any():
                labels[:, 0] = input_ids[:, 1]
            lm_loss = ce_loss_fct(logits.flatten(0, 1), labels.flatten())
        else:
            lm_loss = 0.0

        info_loss = ref_loss = uncertainty_loss = tv_loss = 0
        if informative_labels is not None:
            if not (informative_labels != -100).any():
                informative_labels[:, 0] = 0
            info_loss = ce_loss_fct(informative_logits.flatten(0, 1),
                                    informative_labels.flatten(0, 1))
        if relevance_labels is not None:
            if not (relevance_labels != -100).any():
                relevance_labels[:, 0] = 0
            valid_mask = relevance_labels != -100
            relevance_logits = relevance_logits.squeeze(-1)
            if relevance_logits.shape[1] > 1:
                tv_mask = valid_mask[:, 1:]
                tv_mask.mul(valid_mask[:, :-1])   # ref quirk: result discarded
                tv_loss = torch.mean(
                    (relevance_logits[:, 1:] - relevance_logits[:, :-1]) ** 2)
                tv_loss = (tv_mask * tv_loss).sum() / (tv_mask.sum() + 1e-6)
            relevance_logits_flat = relevance_logits.flatten().float()
            relevance_labels_flat = relevance_labels.flatten().float()
            valid_mask = valid_mask.flatten()
            relevance_logits_valid = relevance_logits_flat[valid_mask]
            relevance_labels_valid = relevance_labels_flat[valid_mask]
            if relevance_labels_valid.numel() > 1:
                ref_loss = rel_loss_fct(relevance_logits_valid,
                                        relevance_labels_valid)
            else:
                ref_loss = torch.tensor(0.0)
            log_variance_clamped = torch.clamp(log_variance, min=-4.0, max=1.5)
            variance = torch.exp(log_variance_clamped)
            residual = relevance_labels_valid - relevance_logits_valid
            variance_valid = variance.flatten(0, 1)[valid_mask]     # [n, 1]
            nll_loss = (residual ** 2) / (2 * variance_valid + 1e-6) \
                + 0.5 * torch.log(2 * math.pi * variance_valid)     # [n, n]!
            uncertainty_loss = nll_loss.mean()
            uncertainty_penalty = -1e-3 * torch.std(log_variance_clamped)
            uncertainty_loss = torch.clamp(
                uncertainty_loss + uncertainty_penalty, min=0)

        ref_loss_with_smoothness = ref_loss + self.tv_loss_weight * tv_loss
        video_loss = (self.info_loss_weight * info_loss
                      + self.ref_loss_weight * ref_loss_with_smoothness
                      + self.uncertainty_loss_weight * uncertainty_loss)
        loss = lm_loss * self.lm_loss_weight + video_loss * self.video_loss_weight
        return types.SimpleNamespace(
            loss=loss, lm_loss=lm_loss, video_loss=video_loss,
            info_loss=info_loss, ref_loss=ref_loss, tv_loss=tv_loss,
            uncertainty_loss=uncertainty_loss,
            logits=logits, informative_logits=informative_logits,
            relevance_logits=relevance_logits, uncertainty=log_variance,
            past_key_values=outputs.past_key_values)


def _ref_state_dict(twin: TorchRefModel) -> dict:
    """Reference checkpoint key layout (what models/loader.convert_* eats)."""
    sd = dict(twin.lm.state_dict())                 # model.* + lm_head.weight
    for i in (0, 2):
        sd[f"model.mm_projector.{i}.weight"] = twin.mm_projector[i].weight
        sd[f"model.mm_projector.{i}.bias"] = twin.mm_projector[i].bias
    sd["informative_head.weight"] = twin.informative_head.weight
    sd["relevance_head.weight"] = twin.relevance_head.weight
    sd["uncertainty_head.weight"] = twin.uncertainty_head.weight
    return {k: v.detach() for k, v in sd.items()}


@pytest.fixture(scope="module")
def pair(bpe_dir):
    """(torch twin, jax params, AhaConfig, StreamTokenizer, hf tokenizer)."""
    from transformers import Qwen2Config

    hf_tok = _ref_hf_tokenizer(bpe_dir)
    vocab = len(hf_tok)
    stok = build_stream_tokenizer(bpe_dir, frame_num_tokens=FRAME_TOKENS)
    assert stok.backend.vocab_size == vocab

    cfg = aha_tiny(vocab_size=vocab).replace(
        frame_token_pooled=(2, 2),
        v_placeholder_id=stok.v_placeholder_id,
        eos_token_id=stok.eos_token_id,
    )
    q = cfg.llm
    qcfg = Qwen2Config(
        vocab_size=vocab, hidden_size=q.hidden_size,
        intermediate_size=q.intermediate_size, num_hidden_layers=q.num_layers,
        num_attention_heads=q.num_heads, num_key_value_heads=q.num_kv_heads,
        head_dim=q.head_dim, rope_theta=q.rope_theta,
        rms_norm_eps=q.rms_norm_eps,
        max_position_embeddings=q.max_position_embeddings,
        tie_word_embeddings=False, attention_dropout=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    twin = TorchRefModel(qcfg, cfg.vision.hidden_size,
                         stok.v_placeholder_id).eval()

    import dataclasses

    sd = _ref_state_dict(twin)
    llm = loader.convert_qwen2(sd, dataclasses.replace(q, vocab_size=vocab))
    proj, heads = loader.convert_projector_heads(sd)
    params = {
        "llm": llm, "projector": proj, "heads": heads,
        # vision tower unused here (features injected post-tower); random init
        "vision": aha.init_aha_params(cfg, jax.random.PRNGKey(0))["vision"],
    }
    return twin, params, cfg, stok, hf_tok


def _load_ref_by_path(path, name, shim_cache=False):
    import transformers

    if shim_cache:
        class _BareCache:
            def __init__(self, *a, **k):
                pass

        real = transformers.Cache
        transformers.Cache = _BareCache
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if shim_cache:
            transformers.Cache = real
    return mod


# ---------------------------------------------------------------------------
# Test 1: composed loss parity on a collated batch
# ---------------------------------------------------------------------------

CONVO_A = [
    {"role": "stream", "num_frames": 3, "learn": True,
     "related": [{"related": 0.2, "num_frames": 1},
                 {"related": 0.8, "num_frames": 2}]},
    {"role": "user", "content": "what is happening in the video?"},
    {"role": "stream", "num_frames": 2, "learn": True, "related": 0.9,
     "response_frame_num": 1},
    {"role": "assistant", "content": "the person is cooking rice.",
     "learn": True},
]
CONVO_B = [
    {"role": "user", "content": "describe the highlight of this clip please"},
    {"role": "stream", "num_frames": 4, "learn": True,
     "related": [{"related": 0.1, "num_frames": 4}]},
    {"role": "assistant", "content": "a rocket launch begins on the pad",
     "learn": True},
]


def test_composed_loss_parity(pair, reference_root):
    """template -> collate -> joint embed -> trunk -> heads -> 5-part loss,
    end to end, ours vs the reference chain (its jinja template + learn
    ranges + data_collator.py + Qwen2 trunk + verbatim loss)."""
    twin, params, cfg, stok, hf_tok = pair
    ref_tok_mod, jinja2 = tt._reference_module(reference_root)
    ref_collator = _load_ref_by_path(
        str(reference_root / "data" / "data_collator.py"), "ref_collator")

    class _Cfg:
        frame_num_tokens = FRAME_TOKENS
        v_placeholder = "<image>"
        v_placeholder_id = stok.v_placeholder_id

    tcfg = TemplateConfig(frame_num_tokens=FRAME_TOKENS)
    rng = np.random.default_rng(3)

    # ---- reference side: ITS template/learn-ranges/collator -------------
    ref_offsets = ref_tok_mod.chat_template_offsets_llava(tt._FakeHFTok())
    batch_in = []
    feats_all = []
    convos = [CONVO_A, CONVO_B]
    for i, convo in enumerate(convos):
        full = [{"role": "system", "content": SYSTEM}] + convo
        text = tt._render_reference(ref_tok_mod, jinja2, full, tcfg)
        learn = ref_tok_mod.get_learn_ranges(
            full, chat_template_offsets=ref_offsets, model_config=_Cfg)
        n_frames = sum(t.get("num_frames", 0) for t in convo
                       if t["role"] == "stream")
        feats = rng.standard_normal(
            (n_frames * FRAME_TOKENS, cfg.vision.hidden_size)).astype(np.float32)
        feats_all.append(feats)
        # per-frame labels (dataset-level inputs, shared by both sides)
        from aha_tpu.data.conversations import informative_labels, relevance_labels
        info = informative_labels(full)
        rel = relevance_labels(full)
        batch_in.append([text, torch.tensor(feats), learn, info, rel, i])

    ref_batch = ref_collator.data_collator_with_video_labels(
        batch_in, tokenizer=hf_tok, model_config=_Cfg)

    with torch.no_grad():
        ref_out = twin(
            input_ids=ref_batch["input_ids"],
            attention_mask=ref_batch["attention_mask"],
            labels=ref_batch["labels"].clone(),
            informative_labels=ref_batch["informative_labels"].clone(),
            relevance_labels=ref_batch["relevance_labels"].clone(),
            frames=ref_batch["frames"],
        )

    # ---- our side: production chain -------------------------------------
    examples = []
    for i, convo in enumerate(convos):
        ex = build_example(convo, stok, system_prompt=SYSTEM)
        ex.frames = None
        ex.sample_idx = i
        examples.append(ex)
    batch = collate(examples, stok, v_placeholder_id=cfg.v_placeholder_id,
                    frame_num_tokens=FRAME_TOKENS,
                    len_buckets=(int(ref_batch["input_ids"].shape[1]),))

    # the collated token tensors must agree exactly (template + offsets +
    # label scatter + left padding)
    np.testing.assert_array_equal(batch.input_ids,
                                  ref_batch["input_ids"].numpy())
    np.testing.assert_array_equal(batch.labels, ref_batch["labels"].numpy())
    np.testing.assert_array_equal(batch.informative_labels,
                                  ref_batch["informative_labels"].numpy())
    np.testing.assert_allclose(batch.relevance_labels,
                               ref_batch["relevance_labels"].numpy())

    feats_cat = jnp.asarray(np.concatenate(feats_all, axis=0))
    frame_embeds = aha.project_features(params, feats_cat)
    out = aha.forward_train(
        params, cfg, jnp.asarray(batch.input_ids), None,
        attn_mask=jnp.asarray(batch.attention_mask),
        frame_embeds=frame_embeds, remat=False)
    parts = aha_loss(
        logits=out.logits, informative_logits=out.informative_logits,
        relevance=out.relevance, log_variance=out.log_variance,
        input_ids=jnp.asarray(batch.input_ids),
        labels=jnp.asarray(batch.labels),
        informative_labels=jnp.asarray(batch.informative_labels),
        relevance_labels=jnp.asarray(batch.relevance_labels),
        weights=LossWeights())

    for name, ours, ref in [
        ("total", parts.total, ref_out.loss),
        ("lm", parts.lm, ref_out.lm_loss),
        ("info", parts.info, ref_out.info_loss),
        ("relevance", parts.relevance, ref_out.ref_loss),
        ("tv", parts.tv, ref_out.tv_loss),
        ("uncertainty", parts.uncertainty, ref_out.uncertainty_loss),
        ("video", parts.video, ref_out.video_loss),
    ]:
        np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4,
                                   atol=2e-5, err_msg=name)

    # per-position head outputs on the real (unpadded) positions
    m = np.asarray(batch.attention_mask)
    np.testing.assert_allclose(np.asarray(out.relevance)[m],
                               ref_out.relevance_logits.numpy()[m],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.log_variance)[m],
                               ref_out.uncertainty.numpy().squeeze(-1)[m],
                               rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# Test 2: streaming trace parity (multi-turn + eviction + triggered gen)
# ---------------------------------------------------------------------------


class TorchMiniLiveInfer:
    """The reference streaming loop shape (test/inference.py:196-328) on the
    torch twin + reference SinkCache, at feature level (no vision tower)."""

    def __init__(self, twin, hf_tok, reference_root, tcfg, *,
                 window, num_sink, threshold, max_new_tokens, fps=1.0):
        sink_mod = _load_ref_by_path(
            str(reference_root / "test" / "sink_cache.py"), "ref_sink_e2e",
            shim_cache=True)

        class CompatSinkCache(sink_mod.SinkCache):
            # installed transformers needs a per-layer sliding list + mask
            # sizes; kv semantics stay 100% the reference class's
            is_sliding = [False]

            def get_mask_sizes(self, cache_position, layer_idx):
                return (self.get_seq_length(layer_idx)
                        + cache_position.shape[0], 0)

        self.twin = twin
        self.tok = hf_tok
        self.tcfg = tcfg
        self.threshold = threshold
        self.max_new_tokens = max_new_tokens
        self.fps = fps
        ref_tok_mod, jinja2 = tt._reference_module(_RefRootHack.root)
        self._render = lambda convo, **fl: tt._render_reference(
            ref_tok_mod, jinja2, convo, tcfg, **fl)
        self._start_ids = self._ids(self._render(
            [{"role": "system", "content": SYSTEM}]))
        self._added_stream_prompt_ids = self._ids(
            self._render([{}], add_stream_prompt=True))
        self._added_stream_generation_ids = self._ids(
            self._render([{}], add_stream_generation_prompt=True))
        self.cache = CompatSinkCache(window_length=window,
                                     num_sink_tokens=num_sink)
        self.eos_token_id = hf_tok.convert_tokens_to_ids(EOS)
        self.reset()

    def _ids(self, text):
        return torch.tensor(
            [self.tok(text, add_special_tokens=False)["input_ids"]],
            dtype=torch.long)

    def reset(self):
        self.last_role = "system"
        self.init_vision_time = False
        self.video_time = 0.0
        self.debug, self.responses = [], []

    def _fwd(self, inputs_embeds):
        return self.twin(inputs_embeds=inputs_embeds,
                         past_key_values=self.cache, use_cache=True)

    def _embed(self, ids):
        return self.twin.lm.get_input_embeddings()(ids)

    # ref _encode_frame (:196-229)
    def encode_frame(self, frame_embeds):
        if not self.init_vision_time:
            last_ids = self._start_ids
            self.init_vision_time = True
        elif self.last_role == "assistant":
            last_ids = torch.cat(
                [self._pending_last_ids, self._added_stream_prompt_ids], dim=1)
        else:
            last_ids = torch.zeros((1, 0), dtype=torch.long)
        inputs_embeds = torch.cat(
            [self._embed(last_ids), frame_embeds.view(1, -1, frame_embeds.shape[-1])],
            dim=1)
        out = self._fwd(inputs_embeds)
        info = out.informative_logits[0, -1].softmax(dim=-1)[1].item()
        rel = out.relevance_logits[0, -1].item()
        unc = torch.exp(out.uncertainty[0, -1]).item()
        self.last_role = "stream"
        return info, rel, unc

    # ref _encode_query (:240-262)
    def encode_query(self, query):
        ids = self._ids(self._render(
            [{"role": "user", "content": query}],
            add_stream_query_prompt=self.last_role == "stream",
            add_stream_prompt=True))
        out = self._fwd(self._embed(ids))
        self.last_role = "user"

    # ref _generate_response (:264-281) + fast_greedy_generate
    def generate_response(self):
        ids = self._added_stream_generation_ids
        inputs_embeds = self._embed(ids)
        out_ids = []
        for _ in range(self.max_new_tokens):
            out = self._fwd(inputs_embeds)
            tok = int(out.logits[0, -1].argmax())
            out_ids.append(tok)
            if tok == self.eos_token_id:
                break
            inputs_embeds = self._embed(torch.tensor([[tok]]))
        self._pending_last_ids = torch.tensor([[out_ids[-1]]])
        self.last_role = "assistant"
        return out_ids

    # ref inference() (:283-334), single query at t=0
    def run(self, feats_per_frame, query):
        with torch.no_grad():
            queries = [(0.0, query)]
            for f in feats_per_frame:
                if queries and self.video_time >= queries[0][0]:
                    self.encode_query(queries.pop(0)[1])
                info, rel, unc = self.encode_frame(f)
                self.debug.append(dict(time=self.video_time,
                                       informative_score=info,
                                       relevance_score=rel,
                                       uncertainty_score=unc))
                if info + rel > self.threshold:
                    self.responses.append(
                        (self.video_time, self.generate_response()))
                self.video_time += 1.0 / self.fps
        return self.debug, self.responses


class _RefRootHack:
    root = None


def test_composed_streaming_parity(pair, reference_root):
    """Per-frame info/rel/unc traces + trigger times + generated token ids
    over a multi-turn stream that fills the sink cache (evictions incl. a
    partial first event) and fires at least one generation, ours
    (StreamSession.inference) vs the torch reference chain."""
    twin, params, cfg, stok, hf_tok = pair
    _RefRootHack.root = reference_root
    tcfg = TemplateConfig(frame_num_tokens=FRAME_TOKENS)

    W, SINK, THR = 96, 8, 1.02
    N_FRAMES, MAX_NEW = 24, 6
    rng = np.random.default_rng(9)
    feats = rng.standard_normal(
        (N_FRAMES, FRAME_TOKENS, cfg.vision.hidden_size)).astype(np.float32) * 0.5
    query = "what is happening in the video?"

    # ---- torch reference chain ------------------------------------------
    mini = TorchMiniLiveInfer(twin, hf_tok, reference_root, tcfg,
                              window=W, num_sink=SINK, threshold=THR,
                              max_new_tokens=MAX_NEW)
    with torch.no_grad():
        frame_embeds_t = [twin.visual_embed(torch.tensor(f)) for f in feats]
    ref_debug, ref_responses = mini.run(frame_embeds_t, query)
    # the stream must actually evict (cache full) to make this a real test
    assert mini.cache.get_seq_length(0) == W

    # ---- ours: the production session -----------------------------------
    icfg = InferConfig(
        frame_fps=1.0, frame_resolution=cfg.frame_resolution,
        system_prompt=SYSTEM,
        stream_end_prob_threshold=THR, max_new_tokens=MAX_NEW,
        kv_cache_policy="sink", kv_window=W, num_sink_tokens=SINK)
    session = build_session(params, cfg, stok, icfg)
    session.reset()
    session.set_fps(fps=1.0)
    emb = np.asarray(aha.project_features(
        params, jnp.asarray(feats.reshape(-1, cfg.vision.hidden_size))))
    emb = emb.reshape(N_FRAMES, FRAME_TOKENS, -1)
    for t in range(N_FRAMES):
        session.input_frame_embeds(jnp.asarray(emb[t]), t / 1.0)
    session.input_query_stream(
        [{"role": "user", "content": query, "time": 0}])
    out = session.inference()

    my_debug = session.debug_data_list
    assert len(my_debug) == len(ref_debug) == N_FRAMES
    for i, (mine, ref) in enumerate(zip(my_debug, ref_debug)):
        for key in ("informative_score", "relevance_score", "uncertainty_score"):
            np.testing.assert_allclose(mine[key], ref[key], rtol=2e-3,
                                       atol=2e-3, err_msg=f"frame {i} {key}")

    # identical trigger decisions and identical greedy generations
    my_responses = [(r["time"], r["content"]) for r in out
                    if r["role"] == "assistant"]
    assert len(ref_responses) >= 1, "stream never triggered; raise THR range"
    # the scenario must include a POST-FILL response boundary: the frame
    # after it carries its role-transition prefix fused into the frame
    # chunk, which only matters (mask_mode='hf') once the window is full —
    # with seed 9 responses land at t=3, 21, 22 and the cache fills ~t=13
    assert max(t for t, _ in ref_responses) > N_FRAMES * 2 // 3, ref_responses
    assert len(my_responses) == len(ref_responses)
    for (t_mine, text_mine), (t_ref, ids_ref) in zip(my_responses, ref_responses):
        assert t_mine == t_ref
        ref_text = hf_tok.decode([i for i in ids_ref], skip_special_tokens=True)
        assert text_mine == ref_text
