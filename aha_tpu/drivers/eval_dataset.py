"""Eval-side streaming QA dataset.

Parity with `FastAndAccurateStreamingVideoQADataset`
(`/root/reference/test/datasets.py:8-141`): JSON conversation file + cv2
decode with `output_fps='auto'` fitting max_num_frames, optional
timechat/vtimellm time-instruction prefixes, missing-video / corrupt-sample
skip (returns None tuple), and the gen-time variant.
"""

from __future__ import annotations

import json
import math
import os
import random

import numpy as np

from aha_tpu.data import media


class StreamingVideoQADataset:
    def __init__(
        self,
        data_file: str,
        video_base_folder: str,
        *,
        start_idx: int = 0,
        end_idx: int | None = None,
        output_fps: float | str = 2,
        output_resolution: int = 384,
        max_num_frames: int = 100,
        time_instruction_format: str | None = None,
        system_prompt: str = (
            "A multimodal AI assistant is helping users with some activities."
            " Below is their conversation, interleaved with the list of video frames"
            " received by the assistant."
        ),
    ):
        with open(data_file) as f:
            self.data = json.load(f)[start_idx:end_idx]
        self.video_base_folder = video_base_folder
        self.output_fps = output_fps
        self.output_resolution = output_resolution
        self.max_num_frames = max_num_frames
        self.system_prompt = system_prompt
        self.time_instruction_format = time_instruction_format

    def __len__(self) -> int:
        return len(self.data)

    def _load_video(self, path: str):
        import cv2

        cap = cv2.VideoCapture(path)
        input_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        frame_count = cap.get(cv2.CAP_PROP_FRAME_COUNT)
        duration = frame_count / input_fps
        cap.release()
        if isinstance(self.output_fps, str) or self.output_fps <= 0:
            # 'auto': spread max_num_frames over the whole video
            fps = self.max_num_frames / duration
        else:
            fps = float(self.output_fps)
        frames, _ = media.decode_video(
            path,
            output_fps=fps,
            output_size=self.output_resolution,
            source_fps=input_fps,
            duration=duration,
            max_frames=self.max_num_frames,
        )
        n = frames.shape[0]
        if self.time_instruction_format == "timechat":
            secs = ",".join(f"{i / fps:.2f}s" for i in range(math.ceil(duration * fps)))
            instr = (
                f"The video lasts for {duration:.2f} seconds, and {n} frames are"
                f" uniformly sampled from it. These frames are located at {secs}."
                "Please answer the following questions related to this video."
            )
            return frames, fps, duration, instr
        if self.time_instruction_format == "vtimellm":
            return frames, fps, duration, f"This is a video with {n} frames."
        return frames, fps, duration, None

    def __getitem__(self, idx: int):
        example = self.data[idx]
        try:
            conversation = list(example["conversation"])
            question_id = example["question_id"]
            candidates = [
                os.path.join(self.video_base_folder, example["video"]),
                os.path.join(self.video_base_folder, example["video"])[:-4] + ".mp4",
            ]
            for path in candidates:
                if os.path.exists(path):
                    frames, fps, duration, instr = self._load_video(path)
                    if instr is not None:
                        conversation[0] = dict(conversation[0])
                        conversation[0]["content"] = instr + "\n" + conversation[0]["content"]
                    conversation = [{"role": "system", "content": self.system_prompt}] + conversation
                    return question_id, frames, conversation, fps, duration
            print(f"Video {example['video']} does not exist, skipping")
            return None, None, None, None, None
        except Exception as e:  # corrupt sample -> skip (ref behavior)
            print(f"error loading {example.get('question_id')}: {e}; skipped")
            return None, None, None, None, None


class StreamingVideoQADatasetWithGenTime(StreamingVideoQADataset):
    def __getitem__(self, idx: int):
        out = super().__getitem__(idx)
        if out[0] is None:
            return (*out, None)
        gen_times = [turn["time"][1] for turn in self.data[idx]["answer"]]
        return (*out, gen_times)
