"""A/B: speculative decoding (n-gram self-drafting, exact greedy parity).

Motivation (BASELINE.md round 3): batched decode is within ~2x of the
chip's weight-stream limit and the in-situ knockouts say the remaining
pass cost is structural — so the decode lever is tokens per weight
stream. `engine.generate_spec` verifies S candidate tokens per pass
(read-only verify + acceptance-gated commit, tests/test_spec_decode.py +
tests/test_spec_generate.py prove exact parity with the sequential loop).

What this measures on the real chip (7B int8, batched greedy decode):

  * base        — the production sequential loop (S=1).
  * specS_reject — drafter monkeypatched to a never-matching constant:
                   every pass emits exactly 1 token/row. Isolates the
                   verify-pass OVERHEAD vs a 1-token pass (the price of
                   speculation when the drafter is useless).
  * specS_accept — lm_head zeroed (argmax = token 0 always): after the
                   first pass the n-gram drafter proposes the repeated
                   token and every pass commits S tokens/row. The
                   full-acceptance CEILING with real weight streams.
  * specS_ngram  — the real drafter on the model's actual greedy output
                   (random weights here; real-checkpoint acceptance is
                   workload-dependent — this arm is the plumbing check,
                   the reject/accept arms are the honest envelope).

Run ON THE CHIP (one TPU process at a time):
    python scripts/perf/ab_spec_decode.py [--b 8] [--tokens 64] [--s 4,8]

Prints one JSON line per variant: {"variant", "tok_s", ...}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


from scripts.perf.perf_utils import zero_lm_head as _zero_lm_head  # noqa: E402


def run(base_params, cfg, policy, variant: str, B: int, max_new: int,
        S: int) -> dict:
    import jax

    from aha_tpu.ops import spec_decode
    from aha_tpu.streaming.engine import StreamEngine

    params = base_params
    orig_draft = spec_decode.ngram_draft
    if variant == "reject":
        # constant never-token drafts: acceptance ~0 (vocab-1 is unused in
        # random greedy output), so tok/s == passes/s * B
        import jax.numpy as jnp

        V = cfg.llm.vocab_size

        def draft(hist, hist_len, carry, n):
            return jnp.full((hist.shape[0], n), V - 1, jnp.int32)

        spec_decode.ngram_draft = draft
    elif variant == "accept":
        params = _zero_lm_head(params)
    try:
        eng = StreamEngine(params, cfg, policy, batch=B,
                           max_new_tokens=max_new,
                           spec_tokens=1 if variant == "base" else S)
        prompts = [list(range(1, 17)) for _ in range(B)]

        def once():
            cache = eng.new_cache()
            t0 = time.perf_counter()
            _, _ids, out_len, _, _ = eng.generate(cache, prompts,
                                                  eng.new_rep_counts())
            n = int(jax.device_get(out_len).sum())
            return n, time.perf_counter() - t0

        once()                  # compile
        once()                  # warm
        best = None
        for _ in range(5):
            n, dt = once()
            r = dict(variant=variant if variant == "base" else f"spec{S}_{variant}",
                     batch=B, tokens=n, wall_s=round(dt, 3),
                     tok_s=round(n / dt, 1),
                     ms_per_pass_ub=round(dt / max(n / B, 1) * 1000, 2))
            if best is None or r["tok_s"] > best["tok_s"]:
                best = r
        return best
    finally:
        spec_decode.ngram_draft = orig_draft


def main():
    # a user-exported AHA_SPEC_DECODE overrides even explicit spec_tokens
    # (the engine's ops kill switch) and would silently turn the 'base'
    # arm speculative — pin the harness to its own per-variant settings
    import os

    os.environ.pop("AHA_SPEC_DECODE", None)
    args = sys.argv
    B = int(args[args.index("--b") + 1]) if "--b" in args else 8
    max_new = int(args[args.index("--tokens") + 1]) if "--tokens" in args else 64
    svals = ([int(x) for x in args[args.index("--s") + 1].split(",")]
             if "--s" in args else [4, 8])
    # build the 7B params ONCE — every variant shares them (a per-variant
    # bench.build would hold two full copies of the weights and OOM the chip)
    import bench

    engine, cfg = bench.build("7b-int8")
    params, policy = engine.params, engine.policy
    del engine
    print(json.dumps(run(params, cfg, policy, "base", B, max_new, 1)),
          flush=True)
    for S in svals:
        for variant in ("reject", "accept", "ngram"):
            print(json.dumps(run(params, cfg, policy, variant, B, max_new, S)),
                  flush=True)


if __name__ == "__main__":
    main()
