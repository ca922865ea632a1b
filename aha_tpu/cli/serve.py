"""`aha serve`: the continuous-batching JSONL server entry point."""

from __future__ import annotations

import argparse
import json
import sys

from aha_tpu.cli._session import _build_session


def cmd_serve(argv):
    """Continuous-batching JSONL server: requests in, results out.

    Each input line is one request:
      {"key": "id", "video": "/path.mp4",
       "conversation": [{"role": "user", "time": 0.0, "content": "..."}]}
    Each output line (written the moment the stream retires, completion
    order): {"key", "responses", ["debug_data" with --emit_scores]}.

    Videos are decoded by a background thread pool ahead of admission, so
    host decode overlaps device serving; `--batch` slots run continuous
    batching (a retired stream's slot is refilled immediately —
    streaming/multi.MultiStreamServer). No reference analog: the
    reference serves one stream per process (test/inference.py:857-908)."""
    import queue as _queue
    import threading
    from concurrent.futures import ThreadPoolExecutor

    p = argparse.ArgumentParser(
        "aha serve", description="continuous-batching JSONL serving")
    p.add_argument("--model_preset", default="7b", choices=["7b", "tiny"])
    p.add_argument("--llm_pretrained", default=None)
    p.add_argument("--tokenizer_pretrained", default=None)
    p.add_argument("--lora_pretrained", default=None)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int4", action="store_true")
    p.add_argument("--synthetic_weights", action="store_true",
                   help="seeded random device-materialized params "
                        "(on-chip rehearsal; see aha infer)")
    p.add_argument("--vision_int8", action="store_true",
                   help="quantize the SigLIP tower too (see aha infer)")
    p.add_argument("--w8a8", action="store_true",
                   help="serving mode: int8 weights + per-token int8 "
                        "activations + int8 vision + fused width 8 "
                        "(see aha infer --w8a8)")
    p.add_argument("--fused_score_frames", type=int, default=4,
                   help="frames verified per decoder weight stream on the "
                        "batched scoring paths (1 = per-frame)")
    p.add_argument("--input", default="-", help="requests JSONL (- = stdin)")
    p.add_argument("--output", default="-", help="results JSONL (- = stdout)")
    p.add_argument("--batch", type=int, default=8, help="concurrent slots")
    p.add_argument("--max_frames", type=int, default=400)
    p.add_argument("--frame_fps", type=float, default=2.0)
    p.add_argument("--decode_workers", type=int, default=2)
    p.add_argument("--emit_scores", action="store_true",
                   help="include per-frame score traces (debug_data)")
    p.add_argument("--stats", action="store_true",
                   help="run the instrumented path and print the wall-clock "
                        "phase split (admit/text/score/gen/host) to stderr "
                        "at exit — adds per-phase sync overhead")
    p.add_argument("--stream_end_prob_threshold", type=float, default=None)
    p.add_argument("--threshold_z", type=float, default=None)
    p.add_argument("--first_n_frames_no_generate", type=int, default=0)
    p.add_argument("--running_list_length", type=int, default=20)
    p.add_argument("--response_min_interval_frames", type=int, default=None)
    p.add_argument("--stream_end_score_sum_threshold", type=float, default=None)
    p.add_argument("--remove_assistant_turns", action="store_true")
    p.add_argument("--score_heads", default="relevance_score,informative_score")
    p.add_argument("--repetition_penalty", type=float, default=None)
    p.add_argument("--max_new_tokens", type=int, default=200)
    p.add_argument("--kv_cache_policy", default="sink",
                   choices=["sink", "sliding", "static", "none"])
    p.add_argument("--kv_window", type=int, default=2048)
    p.add_argument("--num_sink_tokens", type=int, default=32)
    p.add_argument("--kv_cache_dtype", default="auto", choices=["auto", "int8"])
    p.add_argument("--kv_mask_mode", default="hf", choices=["hf", "strict"])
    p.add_argument("--spec_decode_tokens", type=int, default=4,
                   help="speculative decoding: tokens verified per decoder "
                        "pass (1 = off); exact greedy parity either way")
    p.add_argument("--spec_decode_tokens_max", type=int, default=8,
                   help="acceptance-adaptive speculation ceiling (<= "
                        "spec_decode_tokens = fixed width)")
    p.add_argument("--retire_defer", type=int, default=1,
                   help="batched retirement: keep serving on device until "
                        "this many streams finish before returning to the "
                        "host (1 = refill slots immediately; higher = fewer "
                        "host round-trips, idle finished slots meanwhile)")
    p.add_argument("--mesh_data", type=int, default=1,
                   help="shard the slot batch over this many devices")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel devices (serve bf16 7B on a v5e-4: "
                        "--mesh_model 4)")
    args = p.parse_args(argv)
    args.grounding_mode = False

    from aha_tpu.data import media
    from aha_tpu.streaming.multi import MultiStreamServer

    mesh = None
    if args.mesh_data * args.mesh_model > 1:
        from aha_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(args.mesh_data, args.mesh_model)

    session = _build_session(args)
    server = MultiStreamServer(
        session.engine.params, session.cfg, session.tokenizer, session.args,
        batch=args.batch, max_frames=args.max_frames,
        lora=session.engine.lora, lora_scale=session.engine.lora_scale,
        mesh=mesh)

    res = session.cfg.frame_resolution

    class RequestError(Exception):
        def __init__(self, key, cause):
            super().__init__(str(cause))
            self.key = key

    def decode_request(line):
        try:
            req = json.loads(line)
        except Exception as e:
            raise RequestError(None, e)
        key = req.get("key", req.get("video"))
        try:
            frames, _idx = media.decode_video(
                req["video"], output_fps=args.frame_fps, output_size=res,
                max_frames=args.max_frames)
            # per-stream trigger sensitivity (the reference's per-process
            # threshold, kept per-slot in the batched server)
            opts = {k: req[k] for k in ("stream_end_prob_threshold",
                                        "stream_end_score_sum_threshold",
                                        "threshold_z")
                    if k in req}
        except Exception as e:
            raise RequestError(key, e)
        return key, frames, req.get("conversation", []), opts

    # bounded decode-ahead: the pool keeps at most 2*workers requests in
    # flight so a long input backlog cannot exhaust host RAM with frames
    def read_lines(f):
        for line in f:
            line = line.strip()
            if line:
                yield line

    src = sys.stdin if args.input == "-" else open(args.input)
    out = sys.stdout if args.output == "-" else open(args.output, "w")
    pool = ThreadPoolExecutor(max_workers=args.decode_workers)
    pending: _queue.Queue = _queue.Queue()
    depth = threading.Semaphore(2 * args.decode_workers)
    DONE = object()

    def feed_pool():
        try:
            for line in read_lines(src):
                depth.acquire()        # block until a decode slot frees
                pending.put(pool.submit(decode_request, line))
        finally:
            # ALWAYS terminate the stream — a feeder exception (unreadable
            # input, bad encoding) must end the server, not hang it
            pending.put(DONE)

    feeder = threading.Thread(target=feed_pool, daemon=True)
    feeder.start()

    def requests():
        """Yield decoded requests; None while decode lags (run_items keeps
        serving occupied slots instead of stalling on the feeder). The
        head-of-queue future is held locally until done() so an in-flight
        decode never blocks the serving loop."""
        cur = None
        while True:
            if cur is None:
                try:
                    cur = pending.get_nowait()
                except _queue.Empty:
                    yield None
                    continue
            if cur is DONE:
                return
            if not cur.done():
                yield None             # decode still running — keep serving
                continue
            fut, cur = cur, None
            try:
                item = fut.result()
            except Exception as e:     # bad JSON / unreadable video: the
                # stream fails, the server does not (reference analog:
                # dataset retry fallback, datasets.py:333-363)
                depth.release()
                key = getattr(e, "key", None)
                out.write(json.dumps({"key": key, "error": str(e)}) + "\n")
                out.flush()
                continue
            depth.release()
            yield item

    def emit(key, result):
        rec = {"key": key, "responses": result["responses"]}
        if args.emit_scores:
            rec["debug_data"] = result["debug_data"]
        out.write(json.dumps(rec) + "\n")
        out.flush()

    stats: dict | None = {} if args.stats else None
    n = len(server.run_items(requests(), fps=args.frame_fps, on_result=emit,
                             stats=stats))
    pool.shutdown()
    if out is not sys.stdout:
        out.close()
    print(f"served {n} streams", file=sys.stderr)
    if stats is not None:
        print("phase split: " + json.dumps(
            {k: (round(v, 3) if isinstance(v, float) else v)
             for k, v in sorted(stats.items())}), file=sys.stderr)
