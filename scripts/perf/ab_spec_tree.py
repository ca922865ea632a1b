"""A/B: multi-candidate (tree) speculative drafts vs the linear drafter —
measured on REAL decode streams (VERDICT r4 next #2).

The question: the verify pass absorbs extra query rows for free below the
~196-token compute crossover, so a draft TREE (2-3 candidate branches per
pass) could raise committed-tokens/pass at the partial acceptance where
the linear drafter stalls. Before building tree verification into the
engine (tree-structured in-chunk attention + branch-path commit), this
harness answers whether the tree has headroom AT ALL on this drafter:

  1. COLLECT: run real streaming-QA sessions (solo StreamSession loop,
     speculation off) and capture every generation's exact token stream +
     draft context (a shim on engine.generate records prompt/ctx/out_ids).
  2. REPLAY: simulate drafting policies pass-by-pass against the recorded
     sequential truth, mirroring generate_spec's acceptance bookkeeping
     exactly (chunk[0] = carry always commits; draft p accepted iff it
     equals the sequential argmax continuation):
       linear-S     the shipped policy: longest-suffix n-gram match
                    (trigram>bigram>unigram), most recent occurrence,
                    S-1 continuation tokens.
       tree2/tree3  same slot budget split over 2/3 branches: branch 1 =
                    the linear candidate; further branches = continuations
                    from the next-most-recent occurrence of the same key,
                    then shorter-key matches (first tokens deduped).
       oracle-S     upper bound: every pass commits full width.
  3. REPORT committed-tokens/pass per policy + the decisive statistic:
     the fraction of rejected-first-draft passes where ANY alternative
     candidate held the correct next token (the tree's addressable
     headroom — if ~0, no tree can help this drafter).

The replay is exact w.r.t. acceptance (greedy argmax truth is the
recorded stream), so tokens/pass here IS what the device tree would
commit; only the pass-cost side (verify-pass overhead of tree masks)
needs the device, and that is bounded below by the linear pass cost.

Run:  python scripts/perf/ab_spec_tree.py [--tiny] [--streams N]
      [--frames N] [--max_new 32]
Prints one JSON line per policy. On-chip default: 7B int8.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


# ---------------------------------------------------------------------------
# host mirror of ops/spec_decode.ngram_draft with ranked alternatives
# ---------------------------------------------------------------------------


def _matches(h, L, key):
    """All positions j where history h[j:j+len(key)] == key and the
    continuation start j+len(key) < L (excluding the suffix itself),
    most recent first."""
    k = len(key)
    out = []
    for j in range(L - k - 1, -1, -1):
        if h[j:j + k] == key:
            out.append(j + k)
    return out


def draft_candidates(hist, carry, n_draft, n_branches):
    """Ranked continuation candidates: [(tokens, source)] — candidate 1 is
    exactly the shipped drafter (longest key, most recent occurrence);
    further candidates descend (same-key earlier occurrences, then
    shorter keys), deduped on the FIRST token (a tree branch whose first
    token equals another's is redundant by construction)."""
    h = list(hist) + [carry]
    L = len(h)
    keys = []
    if L >= 3:
        keys.append(tuple(h[-3:]))
    if L >= 2:
        keys.append(tuple(h[-2:]))
    keys.append((carry,))
    starts = []
    for key in keys:
        starts.extend(_matches(h, L, list(key)))
    cands, seen_first = [], set()
    for s in starts:
        toks = h[s:s + n_draft]
        toks = toks + [0] * (n_draft - len(toks))
        if toks[0] in seen_first:
            continue
        seen_first.add(toks[0])
        cands.append(toks)
        if len(cands) == n_branches:
            break
    while len(cands) < n_branches:
        cands.append([0] * n_draft)
    return cands


def _prefix_match(draft, truth):
    n = 0
    for d, t in zip(draft, truth):
        if d != t:
            break
        n += 1
    return n


def simulate(streams, policy, budget):
    """streams: list of (ctx+prompt history, generated token list).
    policy: ("linear", 1) | ("tree", n_branches) | ("oracle", 1).
    budget: total chunk slots (carry + budget-1 draft slots).
    Returns (passes, committed, headroom_hits, first_rejects)."""
    kind, nb = policy
    passes = committed = headroom = rejects = 0
    for base_hist, gen in streams:
        n = len(gen)
        i = 0
        hist = list(base_hist)
        while i < n:
            carry = gen[i]
            truth = gen[i + 1:]
            n_draft = budget - 1
            if kind == "oracle":
                adv = 1 + min(n_draft, len(truth))
            else:
                if kind == "linear":
                    branches = draft_candidates(hist, carry, n_draft, 1)
                elif kind == "plus":
                    # budget-EXTENSION tree: the full-length linear
                    # primary plus nb extra single-token alternative
                    # roots — n_draft + nb slots total. Models "verify
                    # rows are ~free below the compute crossover": the
                    # primary never shrinks, alternates only rescue a
                    # rejected first draft (committing exactly 1 extra
                    # token; a deeper rescue would need its own tail).
                    branches = draft_candidates(hist, carry, n_draft,
                                                nb + 1)
                    branches = ([branches[0]]
                                + [b[:1] for b in branches[1:]])
                else:
                    # slot-budget-honest split: nb branches totalling
                    # n_draft slots, leftovers extend branch 1
                    per = max(n_draft // nb, 1)
                    extra = max(n_draft - per * nb, 0)
                    branches = draft_candidates(hist, carry, per + extra, nb)
                    branches = ([branches[0]]
                                + [b[:per] for b in branches[1:]])
                m0 = _prefix_match(branches[0], truth)
                best = max(_prefix_match(b, truth) for b in branches)
                if truth and m0 == 0:
                    rejects += 1
                    if any(b and b[0] == truth[0] for b in branches[1:]):
                        headroom += 1
                adv = 1 + (best if kind in ("tree", "plus") else m0)
            adv = min(adv, n - i)
            hist.extend(gen[i:i + adv])
            i += adv
            passes += 1
            committed += adv
    return passes, committed, headroom, rejects


# ---------------------------------------------------------------------------
# collection: real sessions with a generate() capture shim
# ---------------------------------------------------------------------------


def collect_streams(params, cfg, n_streams, n_frames, max_new):
    import jax.numpy as jnp

    from aha_tpu.config import InferConfig
    from aha_tpu.streaming.session import build_session
    from aha_tpu.tokenization import build_stream_tokenizer

    tok = build_stream_tokenizer(frame_num_tokens=cfg.frame_num_tokens,
                                 vocab_size=cfg.llm.vocab_size)
    icfg = InferConfig(frame_fps=1.0, stream_end_prob_threshold=0.55,
                       kv_cache_policy="sink", kv_window=2048,
                       num_sink_tokens=32, max_new_tokens=max_new,
                       spec_decode_tokens=1, spec_decode_tokens_max=None)
    sess = build_session(params, cfg, tok, icfg)
    sess.engine.encode_frames = lambda v: v
    H, F = cfg.llm.hidden_size, cfg.frame_num_tokens
    streams = []
    orig = sess.engine.generate

    def capture(cache, ids_list, counts, active=None, ctx=None):
        out = orig(cache, ids_list, counts, active=active, ctx=ctx)
        _, out_ids, out_len, *_ = out
        import jax

        oi, ol = jax.device_get((out_ids, out_len))
        ctx_toks = []
        if ctx is not None:
            ci, cl = np.asarray(ctx[0]), np.asarray(ctx[1])
            ctx_toks = [int(t) for t in ci[0, :int(cl[0])]]
        base = ctx_toks + [int(t) for t in ids_list[0]]
        gen = [int(t) for t in np.asarray(oi)[0, :int(np.asarray(ol)[0])]]
        if gen:
            streams.append((base, gen))
        return out

    sess.engine.generate = capture
    for s_i in range(n_streams):
        sess.reset()
        emb = jnp.asarray(0.05 * np.random.default_rng(s_i).standard_normal(
            (n_frames, F, H)), jnp.dtype(cfg.dtype))
        sess.input_video_stream(emb)
        sess.input_query_stream(
            [{"role": "user", "content": f"what is in stream {s_i}?",
              "time": 0.0}])
        sess.inference()
    sess.engine.generate = orig
    return streams


def main():
    tiny = "--tiny" in sys.argv
    n_streams = (int(sys.argv[sys.argv.index("--streams") + 1])
                 if "--streams" in sys.argv else 4)
    n_frames = (int(sys.argv[sys.argv.index("--frames") + 1])
                if "--frames" in sys.argv else 16)
    max_new = (int(sys.argv[sys.argv.index("--max_new") + 1])
               if "--max_new" in sys.argv else 32)
    if tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import bench

    engine, cfg = bench.build("tiny" if tiny else "7b-int8")
    params = engine.params
    del engine
    streams = collect_streams(params, cfg, n_streams, n_frames, max_new)
    n_tok = sum(len(g) for _, g in streams)
    print(json.dumps({"collected_responses": len(streams),
                      "tokens": n_tok}), flush=True)

    for budget in (4, 8):
        rows = []
        for name, pol in (
                (f"linear-{budget}", ("linear", 1)),
                (f"tree2-{budget}", ("tree", 2)),
                (f"tree3-{budget}", ("tree", 3)),
                (f"plus2-{budget}", ("plus", 2)),
                (f"oracle-{budget}", ("oracle", 1))):
            p, c, hr, rej = simulate(streams, pol, budget)
            rows.append({
                "policy": name, "passes": p,
                "tokens_per_pass": round(c / max(p, 1), 3),
                "first_draft_rejects": rej,
                "alt_candidate_had_truth": hr,
                "addressable_headroom_pct":
                    round(100.0 * hr / max(rej, 1), 1),
            })
        for r in rows:
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
