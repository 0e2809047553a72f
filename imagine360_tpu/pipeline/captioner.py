"""Prompt acquisition: sidecar .txt files or a pluggable LMM captioner.

Reference behavior (inference_dual_p2e.py:64-76, 516-524, 567-580): use the
prompt .txt next to the video when present; otherwise caption frame 4 with
Qwen-VL-Chat ("Describe the foreground and possible background of this image
in one sentence") and free the model afterwards.
"""
from __future__ import annotations

import gc
import os
from typing import Callable, Optional

import numpy as np

CAPTION_INSTRUCTION = ("Describe the foreground and possible background of "
                       "this image in one sentence.")


class PromptProvider:
    def __init__(self, default_prompt: str = "",
                 captioner: Optional[Callable[[np.ndarray], str]] = None,
                 lmm_path: Optional[str] = None):
        self.default_prompt = default_prompt
        self.captioner = captioner
        self.lmm_path = lmm_path

    def _lmm_caption(self, frame_u8: np.ndarray) -> Optional[str]:
        """Host-side transformers captioner (optional heavy dependency;
        loaded, used once, freed — reference :567-580)."""
        if not self.lmm_path or not os.path.isdir(self.lmm_path):
            return None
        try:
            import tempfile

            import imageio
            from transformers import AutoModelForCausalLM, AutoTokenizer

            tok = AutoTokenizer.from_pretrained(self.lmm_path,
                                                trust_remote_code=True)
            model = AutoModelForCausalLM.from_pretrained(
                self.lmm_path, trust_remote_code=True).eval()
            with tempfile.NamedTemporaryFile(suffix=".png") as f:
                imageio.imwrite(f.name, frame_u8)
                query = tok.from_list_format([
                    {"image": f.name},
                    {"text": CAPTION_INSTRUCTION},
                ])
                response, _ = model.chat(tok, query=query, history=None)
            del model
            gc.collect()
            return response
        except Exception:
            return None

    def __call__(self, video_path: str, frames_u8: np.ndarray) -> str:
        sidecar = os.path.splitext(video_path)[0] + ".txt"
        if os.path.exists(sidecar):
            return open(sidecar).read().strip()
        # reference captions frame index 4 (:571)
        frame = frames_u8[min(4, len(frames_u8) - 1)]
        if self.captioner is not None:
            return self.captioner(frame)
        caption = self._lmm_caption(frame)
        return caption if caption else self.default_prompt
