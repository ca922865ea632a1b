"""Golden-parity tests for the stream chat template + learn ranges.

The oracle is the reference implementation itself, imported from the
read-only mount and rendered through jinja2 — we never copy its strings.
"""

import sys

import pytest

from aha_tpu.tokenization import (
    BOS,
    EOS,
    CharTokenizer,
    StreamTokenizer,
    TemplateConfig,
    build_stream_tokenizer,
    get_learn_ranges,
    render_chat,
    transition_offsets,
)

CHAT = [
    {"role": "system", "content": "System message 1."},
    {"role": "stream", "num_frames": 2, "learn": 1},
    {"role": "user", "content": "User message 1?"},
    {"role": "assistant", "content": "Assistant message 1.", "learn": True},
    {"role": "stream", "num_frames": 3, "learn": 3},
    {"role": "assistant", "content": "Assistant message 2.", "learn": True},
    {"role": "user", "content": "User message 2?"},
    {"role": "stream", "num_frames": 4, "learn": 4},
    {"role": "assistant", "content": "Assistant message 3.", "learn": True},
]


class _FakeHFTok:
    bos_token = BOS
    eos_token = EOS


def _reference_module(reference_root):
    """Import the reference tokenization module by file path, bypassing the
    reference package __init__ (which depends on llava/deepspeed)."""
    jinja2 = pytest.importorskip("jinja2")
    import importlib.util
    import types

    if "_refmodels" in sys.modules:
        return sys.modules["_refmodels.tokenization_live"], jinja2
    try:
        pkg = types.ModuleType("_refmodels")
        pkg.__path__ = [str(reference_root / "models")]
        sys.modules["_refmodels"] = pkg
        for name in ("configuration_live", "tokenization_live"):
            spec = importlib.util.spec_from_file_location(
                f"_refmodels.{name}", reference_root / "models" / f"{name}.py"
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"_refmodels.{name}"] = mod
            spec.loader.exec_module(mod)
        ref = sys.modules["_refmodels.tokenization_live"]
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference module unimportable: {e}")
    return ref, jinja2


def _render_reference(ref, jinja2, conversation, cfg: TemplateConfig, **flags):
    class _Cfg:
        frame_num_tokens = cfg.frame_num_tokens
        v_placeholder = cfg.v_placeholder

    template_str = ref.chat_template_llava(_FakeHFTok(), ref.get_stream_placeholder_jinja2(_Cfg))
    env = jinja2.Environment()
    defaults = dict(
        add_generation_prompt=False,
        add_stream_prompt=False,
        add_stream_query_prompt=False,
        add_stream_generation_prompt=False,
    )
    defaults.update(flags)
    return env.from_string(template_str).render(
        messages=conversation, bos_token=BOS, eos_token=EOS, **defaults
    )


@pytest.mark.parametrize(
    "flags",
    [
        {},
        {"add_generation_prompt": True},
        {"add_stream_prompt": True},
        {"add_stream_generation_prompt": True},
        {"add_stream_query_prompt": True},
    ],
)
@pytest.mark.parametrize("frame_num_tokens", [1, 10, 49])
def test_render_matches_reference(reference_root, flags, frame_num_tokens):
    ref, jinja2 = _reference_module(reference_root)
    cfg = TemplateConfig(frame_num_tokens=frame_num_tokens)
    ours = render_chat(CHAT, cfg, **flags)
    golden = _render_reference(ref, jinja2, CHAT, cfg, **flags)
    assert ours == golden


def test_bare_prompt_renders(reference_root):
    """The reference passes [{}] to get trailing prompts (inference.py:92-94)."""
    ref, jinja2 = _reference_module(reference_root)
    cfg = TemplateConfig(frame_num_tokens=49)
    for flags in ({"add_stream_prompt": True}, {"add_stream_generation_prompt": True}):
        ours = render_chat([{}], cfg, **flags)
        golden = _render_reference(ref, jinja2, [{}], cfg, **flags)
        assert ours == golden
        assert ours  # non-empty


def test_learn_ranges_match_reference(reference_root):
    ref, _ = _reference_module(reference_root)

    class _Cfg:
        frame_num_tokens = 10
        v_placeholder = "<image>"

    cfg = TemplateConfig(frame_num_tokens=10)
    ref_offsets = ref.chat_template_offsets_llava(_FakeHFTok())
    golden = ref.get_learn_ranges(CHAT, chat_template_offsets=ref_offsets, model_config=_Cfg)
    ours = get_learn_ranges(CHAT, cfg)
    assert [(r.start, r.stop) for r in ours] == [(r.start, r.stop) for r in golden]


def test_learn_ranges_cover_assistant_text():
    cfg = TemplateConfig(frame_num_tokens=10)
    text = render_chat(CHAT, cfg)
    ranges = get_learn_ranges(CHAT, cfg)
    assert len(ranges) == 3
    for r, expected in zip(ranges, ["Assistant message 1.", "Assistant message 2.", "Assistant message 3."]):
        assert text[r.start : r.stop] == expected + EOS


def test_transition_offsets_consistency():
    """Every transition length equals the actual rendered inter-turn text."""
    cfg = TemplateConfig(frame_num_tokens=3)
    offs = transition_offsets(cfg)
    convo = [
        {"role": "system", "content": "s"},
        {"role": "stream", "num_frames": 1},
        {"role": "assistant", "content": "a", "learn": True},
    ]
    text = render_chat(convo, cfg)
    (r,) = get_learn_ranges(convo, cfg)
    assert text[r.start : r.stop] == "a" + EOS
    assert offs["eos_token"] == len(EOS)


def test_char_tokenizer_roundtrip_and_offsets():
    tok = CharTokenizer(vocab_size=512)
    text = f"{BOS}stream\n" + "<image>" * 4 + f"{EOS}hello"
    ids, offsets = tok.encode_with_offsets(text)
    # specials are single tokens
    assert ids.count(tok.special_to_id["<image>"]) == 4
    assert ids[0] == tok.bos_token_id
    # offsets tile the string exactly
    assert offsets[0] == (0, len(BOS))
    assert all(offsets[i][1] == offsets[i + 1][0] for i in range(len(offsets) - 1))
    assert offsets[-1][1] == len(text)
    assert tok.decode(ids) == "stream\n" + "hello"


def test_stream_tokenizer_end_to_end_labels():
    """Learn ranges -> token label scatter must align with token offsets."""
    st = build_stream_tokenizer(frame_num_tokens=4, vocab_size=512)
    convo = [
        {"role": "system", "content": "sys."},
        {"role": "stream", "num_frames": 2, "learn": True},
        {"role": "assistant", "content": "Reply!", "learn": True},
    ]
    text = st.apply_chat_template(convo, tokenize=False)
    ids, offsets = st.encode_with_offsets(text)
    (learn_r,) = st.get_learn_ranges(convo)
    starts = [o[0] for o in offsets]
    start = starts.index(learn_r.start)
    stop = starts.index(learn_r.stop) if learn_r.stop <= starts[-1] else len(ids)
    # labels are shifted by one (next-token prediction)
    labeled = ids[start:stop]
    assert st.decode(labeled) == "Reply!"
    assert labeled[-1] == st.eos_token_id or st.backend.id_to_special.get(labeled[-1]) == EOS

    # the stream turn contributes exactly num_frames * frame_num_tokens placeholders
    assert ids.count(st.v_placeholder_id) == 2 * 4
