"""Per-benchmark inference drivers.

Output-format parity with the reference's eval driver branches
(`/root/reference/test/inference.py:590-952`):

  * tvsum / tvsum_degraded -> one JSON array of
    {video_uuid, model_response_list, video_duration, true_frames_list,
     debug_data} with scores rounded to 3 significant figures;
  * hisum -> same + {categories, h5_identifier};
  * streaming QA (youcook2/magqa/charades/...) -> JSONL of
    {question_id, model_response_list, video_duration, debug_data}.

All three use the TPU fast path (`StreamSession.score_video`, one jitted
scan) whenever generation cannot trigger, and the interactive loop
otherwise.
"""

from __future__ import annotations

import csv
import json
import os
import random

import numpy as np

from aha_tpu.data import media
from aha_tpu.drivers.eval_dataset import StreamingVideoQADataset
from aha_tpu.eval.tvsum import load_annotations  # noqa: F401  (driver convenience)
from aha_tpu.streaming.session import StreamSession

QUERY_TEMPLATES = [
    "%s",
    "%s",
    "What segment of the video addresses the topic '%s'?",
    "At what timestamp can I find information about '%s' in the video?",
    "Can you highlight the section of the video that pertains to '%s'?",
    "Which moments in the video discuss '%s' in detail?",
    "Identify the parts that mention '%s'.",
    "Where in the video is '%s' demonstrated or explained?",
    "What parts are relevant to the concept of '%s'?",
    "Which clips in the video relate to the query '%s'?",
    "Can you point out the video segments that cover '%s'?",
    "What are the key timestamps in the video for the topic '%s'?",
]


def truncate_sig(x: float, sig: int = 3) -> float:
    if x == 0:
        return 0
    return float(f"{x:.{sig}g}")


def round_numbers(data, n: int = 3):
    """Ref round_numbers (test/inference.py:360-375)."""
    if isinstance(data, list):
        return [round_numbers(d, n) for d in data]
    if isinstance(data, dict):
        return {k: round_numbers(v, n) for k, v in data.items()}
    if isinstance(data, float):
        return truncate_sig(data, n) if abs(data) <= 10 ** (-n) else round(data, n)
    return data


def load_tvsum_captions(caption_file: str) -> dict:
    """TVSum info TSV: category, id, title, url, length."""
    captions = {}
    with open(caption_file, newline="") as f:
        reader = csv.reader(f, delimiter="\t")
        next(reader)
        for row in reader:
            _, vid_id, caption, _, _ = row[:5]
            captions[vid_id] = {"query": caption}
    return captions


def _score_only_pass(session: StreamSession, frames, fps: float, query: str):
    """Run the no-generation scoring pass and return (responses, debug)."""
    session.reset()
    session.set_fps(fps=fps)
    session.score_video(frames, query=query)
    return [], session.debug_data_list


def _full_pass(session: StreamSession, frames, fps: float, conversation):
    session.reset()
    session.set_fps(fps=fps)
    session.input_video_stream(frames)
    session.input_query_stream(conversation)
    responses = session.inference()
    return responses, session.debug_data_list


def run_tvsum(
    session: StreamSession,
    *,
    input_dir: str,
    caption_file: str,
    video_metadata_file: str,
    output_fname: str,
    frame_fps: float = 1.0,
    degraded: bool = False,
    dropout_types: tuple[str, ...] = ("color_banding",),
    title_ablation: str | None = None,      # None | 'ambiguous' | 'unrelated'
    title_table: str | None = None,         # JSON {vid: {ambiguous_title, unrelated_title}}
    no_query: bool = False,
    generation: bool = False,
    seed: int | None = None,
) -> list[dict]:
    """TVSum / TVSum-degraded driver (ref test/inference.py:632-711)."""
    metadata = media.scan_metadata(input_dir, video_metadata_file)
    captions = load_tvsum_captions(caption_file)
    titles = {}
    if title_ablation:
        assert title_table, "title ablation requires --title_table JSON"
        with open(title_table) as f:
            titles = json.load(f)
    rng = random.Random(seed) if seed is not None else random

    from aha_tpu.data.pipeline import prefetch_iterable

    def decoded():
        # next video decodes on the host while the chip scores the current
        for video_name in metadata:
            video_uuid = os.path.splitext(os.path.basename(video_name))[0]
            if video_uuid not in captions:
                continue
            video_path = metadata[video_name]["path"]
            title = captions[video_uuid]["query"]
            if title_ablation:
                title = titles[video_uuid][f"{title_ablation}_title"]
            query = "" if no_query else rng.choice(QUERY_TEMPLATES) % title

            dropout = None
            if degraded:
                dur = metadata[video_name]["duration"]
                segs = media.generate_dropout_segments(dur, seed=hash(video_uuid) % 2**31)
                dropout = [(s, e, rng.choice(dropout_types)) for s, e, _ in segs]
            frames, true_frames = media.decode_video(
                video_path, output_fps=frame_fps,
                output_size=session.args.frame_resolution,
                source_fps=metadata[video_name].get("fps"),
                duration=metadata[video_name].get("duration"),
                dropout_intervals=dropout,
            )
            if frames.shape[0] == 0:
                continue
            yield video_uuid, frames, true_frames, query

    results = []
    for video_uuid, frames, true_frames, query in prefetch_iterable(decoded()):
        duration = frames.shape[0] / frame_fps
        if generation:
            conv = [{"role": "user", "content": query, "time": 0}]
            responses, debug = _full_pass(session, frames, frame_fps, conv)
        else:
            responses, debug = _score_only_pass(session, frames, frame_fps, query)
        results.append({
            "video_uuid": video_uuid,
            "model_response_list": responses,
            "video_duration": duration,
            "true_frames_list": true_frames,
            "debug_data": round_numbers(debug, 3),
        })
    with open(output_fname, "w") as f:
        json.dump(results, f, indent=4)
    return results


def run_hisum(
    session: StreamSession,
    *,
    input_dir: str,
    anno_file: str,            # JSON with {"test_keys": [...]}
    h5_file: str,
    hisum_metadata: str,       # CSV video_id,title,labels,youtube_id,yt8m_file
    video_metadata_file: str,
    output_fname: str,
    frame_fps: float = 1.0,
    no_query: bool = False,
    seed: int | None = None,
) -> list[dict]:
    """Mr.HiSum driver (ref test/inference.py:714-794)."""
    import ast

    import h5py

    with h5py.File(h5_file, "r"):
        pass  # fail fast on a bad gtscore file (used at evaluate time)
    metadata = media.scan_metadata(input_dir, video_metadata_file)
    with open(anno_file) as f:
        videos = json.load(f)["test_keys"]
    rng = random.Random(seed) if seed is not None else random

    video_info = {}
    with open(hisum_metadata, newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            try:
                categories = [c for c in ast.literal_eval(row["labels"]) if c]
            except (SyntaxError, ValueError):
                categories = []
            video_info[row["video_id"]] = {
                "caption": row["title"],
                "categories": categories,
                "youtube_id": row["youtube_id"],
            }

    from aha_tpu.data.pipeline import prefetch_iterable

    def decoded():
        for video_id in videos:
            info = video_info.get(video_id)
            if info is None:
                continue
            fname = f"{info['youtube_id']}.mp4"
            if fname not in metadata:
                continue
            try:
                query = "" if no_query else rng.choice(QUERY_TEMPLATES) % info["caption"]
                frames, true_frames = media.decode_video(
                    metadata[fname]["path"], output_fps=frame_fps,
                    output_size=session.args.frame_resolution,
                    source_fps=metadata[fname].get("fps"),
                    duration=metadata[fname].get("duration"),
                )
                if frames.shape[0] == 0:
                    continue
                yield video_id, info, fname, frames, true_frames, query
            except Exception as e:  # per-video resilience (ref :787-788)
                print(f"Exception on video {fname}: {e}")

    results = []
    for video_id, info, fname, frames, true_frames, query in \
            prefetch_iterable(decoded()):
        try:
            responses, debug = _score_only_pass(session, frames, frame_fps, query)
            results.append({
                "categories": info["categories"],
                "h5_identifier": video_id,
                "video_uuid": info["youtube_id"],
                "model_response_list": responses,
                "video_duration": frames.shape[0] / frame_fps,
                "true_frames_list": true_frames,
                "debug_data": round_numbers(debug, 3),
            })
        except Exception as e:  # per-video resilience (ref :787-788)
            print(f"Exception on video {fname}: {e}")
    with open(output_fname, "w") as f:
        json.dump(results, f, indent=4)
    return results


def run_offline_baseline(
    session: StreamSession,
    *,
    test_fname: str,
    input_dir: str,
    output_fname: str,
    frame_fps: float,
    max_num_frames: int,
    start_idx: int = 0,
    end_idx: int | None = None,
) -> list[dict]:
    """Offline single-answer baseline driver (ref test/inference.py:910-951):
    whole video + question -> one generated response per example. JSONL of
    {question_id, model_response, question, video_duration}."""
    dataset = StreamingVideoQADataset(
        test_fname, input_dir,
        start_idx=start_idx, end_idx=end_idx,
        output_fps=frame_fps, output_resolution=session.args.frame_resolution,
        max_num_frames=max_num_frames, system_prompt=session.args.system_prompt,
    )
    results = []
    with open(output_fname, "w") as f_out:
        for i in range(len(dataset)):
            question_id, frames, conversation, fps, duration = dataset[i]
            if question_id is None:
                continue
            question = next(t["content"] for t in conversation if t["role"] == "user")
            response = session.offline_generate(frames, question, fps=fps)
            res = {"question_id": question_id, "model_response": [response],
                   "question": question, "video_duration": duration}
            results.append(res)
            f_out.write(json.dumps(res) + "\n")
            if i % 10 == 0:
                f_out.flush()
    return results


def run_streaming_qa(
    session: StreamSession,
    *,
    test_fname: str,
    input_dir: str,
    output_fname: str,
    frame_fps: float,
    max_num_frames: int,
    grounding_mode: bool = False,
    start_idx: int = 0,
    end_idx: int | None = None,
    time_instruction_format: str | None = None,
) -> list[dict]:
    """Generic streaming QA driver: youcook2 / magqa / charades
    (ref test/inference.py:857-908). JSONL output."""
    dataset = StreamingVideoQADataset(
        test_fname, input_dir,
        start_idx=start_idx, end_idx=end_idx,
        output_fps=frame_fps, output_resolution=session.args.frame_resolution,
        max_num_frames=max_num_frames,
        time_instruction_format=time_instruction_format,
        system_prompt=session.args.system_prompt,
    )
    from aha_tpu.data.pipeline import prefetch_iterable

    results = []
    items = prefetch_iterable(
        (dataset[i] for i in range(len(dataset))), depth=2)
    with open(output_fname, "w") as f_out:
        for i, item in enumerate(items):
            question_id, frames, conversation, fps, duration = item
            if question_id is None:
                continue
            if grounding_mode:
                query = next(
                    (t["content"] for t in conversation if t["role"] == "user"), "")
                responses, debug = _score_only_pass(session, frames, fps, query)
                responses = [
                    {"time": t.get("time", 0), "content": t["content"], "role": "user"}
                    for t in conversation if t["role"] == "user"
                ]
            else:
                user_turns = [t for t in conversation if t["role"] in ("user",)]
                responses, debug = _full_pass(session, frames, fps, user_turns)
            res = {
                "question_id": question_id,
                "model_response_list": responses,
                "video_duration": duration,
                "debug_data": round_numbers(debug, 3),
            }
            results.append(res)
            f_out.write(json.dumps(res) + "\n")
            if i % 5 == 0:
                f_out.flush()
    return results


def run_streaming_qa_multi(
    session: StreamSession,
    *,
    batch: int,
    test_fname: str,
    input_dir: str,
    output_fname: str,
    frame_fps: float,
    max_num_frames: int,
    grounding_mode: bool = False,
    start_idx: int = 0,
    end_idx: int | None = None,
    time_instruction_format: str | None = None,
) -> list[dict]:
    """run_streaming_qa over `batch` concurrent streams on one chip
    (`aha infer --concurrent_streams N`).

    The batch dimension runs over videos, so every weight pass from HBM
    scores a frame for all N streams (the reference runs one stream per
    process/GPU — test/inference.py:857-908). Outputs are identical in
    format and, per stream, in content to the solo driver (the multi-stream
    engines reproduce independent sessions exactly — tests/test_multi_stream.py),
    and the JSONL lines follow dataset order.

    Generation mode runs continuous batching (`MultiStreamServer`): a slot
    is refilled the moment its stream finishes, so ragged video lengths
    don't idle the batch. Grounding mode scores fixed groups in one
    `lax.scan` each (the faster shape when nothing can trigger), padding
    the last group with empty streams. Requires a fixed --frame_fps
    (no 'auto' per-video fps)."""
    from aha_tpu.streaming.multi import MultiStreamScorer, MultiStreamServer

    if not isinstance(frame_fps, (int, float)) or frame_fps <= 0:
        raise ValueError("concurrent streams need a fixed positive frame_fps "
                         "(per-video 'auto' fps cannot run in lockstep)")

    dataset = StreamingVideoQADataset(
        test_fname, input_dir,
        start_idx=start_idx, end_idx=end_idx,
        output_fps=frame_fps, output_resolution=session.args.frame_resolution,
        max_num_frames=max_num_frames,
        time_instruction_format=time_instruction_format,
        system_prompt=session.args.system_prompt,
    )
    results: list[dict] = []
    if grounding_mode:
        multi = MultiStreamScorer(session.engine.params, session.cfg,
                                  session.tokenizer, session.args, batch=batch,
                                  lora=session.engine.lora,
                                  lora_scale=session.engine.lora_scale)

        def flush_group(group, f_out):
            n = len(group)
            if n == 0:
                return
            S = session.args.frame_resolution
            # zero-frame pads: the scorer's active mask blanks them, so
            # pads cost nothing
            pad = [(None, np.zeros((0, S, S, 3), np.uint8), [], frame_fps, 0.0)
                   ] * (batch - n)
            items = group + pad
            # real rows default to "" like the solo driver (score_video
            # appends an empty user turn — same cache prefix as N=1);
            # zero-frame pad rows get None = no prefix at all
            queries = [next((t["content"] for t in it[2] if t["role"] == "user"),
                            "" if it[0] is not None else None) for it in items]
            debugs = multi.score_videos([it[1] for it in items], queries,
                                        fps=frame_fps)
            for it, dbg in zip(items[:n], debugs[:n]):
                res = {
                    "question_id": it[0],
                    "model_response_list": [
                        {"time": t.get("time", 0), "content": t["content"],
                         "role": "user"}
                        for t in it[2] if t["role"] == "user"],
                    "video_duration": it[4],
                    "debug_data": round_numbers(dbg, 3),
                }
                results.append(res)
                f_out.write(json.dumps(res) + "\n")
            f_out.flush()

        group: list = []
        with open(output_fname, "w") as f_out:
            for i in range(len(dataset)):
                item = dataset[i]
                if item[0] is None:
                    continue
                group.append(item)
                if len(group) == batch:
                    flush_group(group, f_out)
                    group = []
            flush_group(group, f_out)
        return results

    # generation mode: continuous batching over the dataset
    from aha_tpu.data.pipeline import prefetch_iterable

    server = MultiStreamServer(session.engine.params, session.cfg,
                               session.tokenizer, session.args, batch=batch,
                               max_frames=max_num_frames,
                               lora=session.engine.lora,
                               lora_scale=session.engine.lora_scale)
    meta: dict[int, tuple] = {}
    order: list[int] = []

    def gen_items():
        # prefetch: the next videos decode on the host while the chip
        # serves the current admission wave
        raw = prefetch_iterable(
            ((idx, dataset[idx]) for idx in range(len(dataset))), depth=2)
        for idx, (qid, frames, conversation, _fps, duration) in raw:
            if qid is None:
                continue
            meta[idx] = (qid, duration)
            order.append(idx)
            yield idx, frames, [t for t in conversation if t["role"] == "user"]

    done: dict[int, dict] = {}
    written = [0]
    with open(output_fname, "w") as f_out:

        def flush_ordered():
            while written[0] < len(order) and order[written[0]] in done:
                idx = order[written[0]]
                row = done.pop(idx)
                qid, duration = meta[idx]
                res = {
                    "question_id": qid,
                    "model_response_list": row["responses"],
                    "video_duration": duration,
                    "debug_data": round_numbers(row["debug_data"], 3),
                }
                results.append(res)
                f_out.write(json.dumps(res) + "\n")
                written[0] += 1
            f_out.flush()

        def on_result(idx, row):
            done[idx] = row
            flush_ordered()

        server.run_items(gen_items(), fps=frame_fps, on_result=on_result)
        flush_ordered()
    return results
