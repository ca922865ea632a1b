"""Model cores: Qwen2 decoder, SigLIP vision tower, projector, score heads,
and the combined Aha multimodal model — all pure functions over param pytrees.

Equivalent surface to the reference's `models/` package
(`/root/reference/models/__init__.py:8-20`): build model + tokenizer, parse
configs, forward/step.
"""

from aha_tpu.models.aha import (  # noqa: F401
    AhaParams,
    build_model_and_tokenizer,
    init_aha_params,
)
