"""Production tokenizer path: a REAL byte-level BPE fast tokenizer (the same
machinery as Qwen2's, `/root/reference/models/tokenization_live.py:115-131`)
behind StreamTokenizer — multi-char tokens exercise the offset-mapping label
scatter in a way the char-level test backend cannot.

The tokenizer is trained in-test (no network): byte-level BPE + the chat
specials + `<image>`, saved/loaded through the exact HF path production uses
(AutoTokenizer local_files_only -> tokenization.HFTokenizer).
"""

import numpy as np
import pytest

import jax

from aha_tpu.tokenization import BOS, EOS, build_stream_tokenizer


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    corpus = [
        "A multimodal AI assistant is helping users with some activities.",
        "Below is their conversation, interleaved with the list of video frames.",
        "the quick brown fox jumps over the lazy dog",
        "what is happening in the video? the person is cooking rice.",
        "describe the highlight of this clip please",
    ] * 20
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=700,
        special_tokens=[BOS, EOS, "<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token=BOS, eos_token=EOS,
        pad_token="<|endoftext|>")
    d = tmp_path_factory.mktemp("bpe_tok")
    fast.save_pretrained(str(d))
    return str(d)


def test_bpe_template_roundtrip_and_placeholders(bpe_dir):
    tok = build_stream_tokenizer(bpe_dir, frame_num_tokens=4)
    convo = [
        {"role": "system", "content": "helping users"},
        {"role": "stream", "num_frames": 3, "learn": True},
        {"role": "user", "content": "what is happening in the video?"},
        {"role": "assistant", "content": "the person is cooking rice.", "learn": True},
    ]
    ids = tok.apply_chat_template(convo)
    # multi-char BPE tokens: far fewer ids than chars
    text = tok.apply_chat_template(convo, tokenize=False)
    assert len(ids) < len(text)
    assert ids.count(tok.v_placeholder_id) == 3 * 4
    # eos/bos resolve to real vocabulary ids
    assert tok.eos_token_id >= 0 and tok.v_placeholder_id >= 0
    # decode of the full sequence round-trips the visible text
    decoded = tok.decode(ids, skip_special_tokens=True)
    assert "cooking rice" in decoded


def test_bpe_learn_ranges_map_to_token_labels(bpe_dir):
    """Char learn-ranges -> token labels through REAL BPE offsets: the
    labeled ids must decode back to exactly the assistant text + eos
    (pre-shifted by one, ref data_collator.py:30-36)."""
    from aha_tpu.data.collator import collate
    from aha_tpu.data.conversations import IGNORE, build_example

    tok = build_stream_tokenizer(bpe_dir, frame_num_tokens=2)
    convo = [
        {"role": "stream", "num_frames": 2, "learn": True},
        {"role": "user", "content": "describe the highlight"},
        {"role": "assistant", "content": "the quick brown fox", "learn": True},
        {"role": "user", "content": "and then?"},
        {"role": "assistant", "content": "jumps over the lazy dog", "learn": True},
    ]
    ex = build_example(convo, tok, system_prompt="helping users")
    ex.frames = np.zeros((2, 8, 8, 3), np.uint8)
    batch = collate([ex], tok, v_placeholder_id=tok.v_placeholder_id,
                    frame_num_tokens=2, len_buckets=(256,), frame_buckets=(2,))
    ids = np.asarray(batch.input_ids[0])
    labels = np.asarray(batch.labels[0])
    learned = labels[labels != IGNORE]
    text = tok.decode(learned.tolist(), skip_special_tokens=False)
    assert "the quick brown fox" in text
    assert "jumps over the lazy dog" in text
    assert text.count(EOS) == 2
    # pre-shift: labels[i] must equal ids[i+1] wherever set
    (pos,) = np.where(labels != IGNORE)
    np.testing.assert_array_equal(labels[pos], ids[pos + 1])


def test_bpe_end_to_end_session(bpe_dir):
    """Full streaming session (scores + a generated response) on the real
    BPE tokenizer — the production path minus the 7B weights."""
    from aha_tpu import config as C
    from aha_tpu.config import InferConfig
    from aha_tpu.models import aha
    from aha_tpu.streaming.session import build_session

    tok = build_stream_tokenizer(bpe_dir, frame_num_tokens=1)
    cfg = C.aha_tiny(vocab_size=2048)
    params, cfg, _ = aha.build_model_and_tokenizer(cfg)
    # rebind config ids to the BPE tokenizer's vocabulary
    cfg = cfg.replace(v_placeholder_id=tok.v_placeholder_id,
                      eos_token_id=tok.eos_token_id)
    icfg = InferConfig(stream_end_prob_threshold=0.4, frame_fps=1.0,
                       kv_cache_policy="sink", kv_window=64, num_sink_tokens=4,
                       max_new_tokens=5)
    sess = build_session(params, cfg, tok, icfg)
    frames = np.random.default_rng(0).integers(
        0, 255, (5, cfg.frame_resolution, cfg.frame_resolution, 3), np.uint8)
    sess.input_video_stream(frames)
    sess.input_query_stream([{"role": "user", "content": "describe the video", "time": 1.0}])
    out = sess.inference()
    assert len(sess.debug_data_list) == 5
    resp = [t for t in out if t["role"] == "assistant"]
    assert resp, "low threshold must trigger at least one response"
    assert all(isinstance(t["content"], str) for t in resp)
