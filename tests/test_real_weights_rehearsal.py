"""Rehearse the docs/REAL_WEIGHTS.md runbook against a synthetic HF
checkpoint (VERDICT r4 next #6): generates a format-faithful artifact set
(sharded bf16 safetensors + config.json + real BPE tokenizer + peft
adapter dir) and executes every runbook command — conversion snippet, CLI
`aha infer --llm_pretrained/--lora_pretrained`, fixture recording +
drift replay — certifying the runbook executable end-to-end offline.

Slow tier: two subprocess fixture recordings + a CLI drive (~2-4 min on
the 1-core CPU host). The fast tier covers the pieces individually
(test_loader, test_bpe_tokenizer, test_golden_fixture).
"""

import pathlib
import sys

import pytest

pytest.importorskip("cv2")
pytest.importorskip("safetensors")
pytest.importorskip("tokenizers")

sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "scripts"))


@pytest.mark.slow
def test_real_weights_runbook_rehearsal(tmp_path):
    from rehearse_real_weights import rehearse

    report = rehearse(str(tmp_path))
    assert report["cli_frames_scored"] > 0
    assert report["lora_effect_max_delta"] > 0
    assert report["fixture_frames"] == 8
    assert report["lora_scale"] == 2.0
