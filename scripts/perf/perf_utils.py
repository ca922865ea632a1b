"""Shared helpers for the scripts/perf A/B harnesses (and their tests)."""

from __future__ import annotations


def zero_lm_head(params):
    """Zero the lm_head kernel (dense or quantized dict layout) so greedy
    argmax is constant: after the first token the n-gram drafter proposes
    the repeated token and every speculative chunk commits at full width —
    the full-acceptance ceiling arm of the spec-decode A/Bs."""
    import jax.numpy as jnp

    llm = params["llm"]
    k = llm["lm_head"]["kernel"]
    if isinstance(k, dict):
        k = {**k, "qvalue": jnp.zeros_like(k["qvalue"])}
    else:
        k = jnp.zeros_like(k)
    return {**params, "llm": {**llm, "lm_head": {"kernel": k}}}
