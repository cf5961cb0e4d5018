"""Shared HF chat-template teacher flow.

Mirrors the reference BaseAdapter python-baseline pipeline
(benchsuite/models/base.py:620-655): AutoProcessor chat template with a
user turn of [image, text], processor(images, text) → inputs,
``model.generate(do_sample=False, use_cache=True)``, prompt/generated
token split at the input length. CPU f32, seeded."""

from __future__ import annotations

import pathlib
import time
from typing import Any, Dict

import numpy as np

from ..capture import TeacherResult


class ChatTemplateTeacher:
    """Generic HF teacher for processor-based VLM repos.

    Subclasses set ``model_id`` and may override ``load_model``,
    ``build_messages``, ``prepare_inputs`` or ``generate_kwargs`` for
    family quirks (GLM tokenizes via apply_chat_template directly,
    reference glm.py:64-91)."""

    model_id = "chat-template"
    use_fast_processor = False

    def __init__(
        self, model_dir: pathlib.Path, trust_remote_code: bool = False
    ):
        self.model_dir = pathlib.Path(model_dir)
        # executes arbitrary code from model_dir when True — the teachers
        # CLI gates it behind an explicit --trust-remote-code (r4 advisor)
        self.trust_remote_code = trust_remote_code

    # -- hooks ----------------------------------------------------------------

    def load_processor(self):
        from transformers import AutoProcessor

        return AutoProcessor.from_pretrained(
            str(self.model_dir),
            trust_remote_code=self.trust_remote_code,
            use_fast=self.use_fast_processor,
        )

    def load_model(self, torch):
        from transformers import AutoModelForCausalLM

        model = AutoModelForCausalLM.from_pretrained(
            str(self.model_dir),
            trust_remote_code=self.trust_remote_code,
            use_safetensors=True,
        )
        return model.to(torch.float32).eval().to(torch.device("cpu"))

    def build_messages(self, image: pathlib.Path, prompt: str):
        return [
            {
                "role": "user",
                "content": [
                    {"type": "image", "url": str(image)},
                    {"type": "text", "text": prompt},
                ],
            }
        ]

    def prepare_inputs(
        self, processor, image: pathlib.Path, prompt: str, torch
    ):
        """→ (rendered_prompt, inputs dict). Default: template renders the
        text, processor tokenizes text+image (base.py:636-646)."""
        from PIL import Image

        messages = self.build_messages(image, prompt)
        rendered = processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
        pil = Image.open(image).convert("RGB")
        inputs = processor(images=[pil], text=[rendered], return_tensors="pt")
        inputs.pop("token_type_ids", None)
        return rendered, dict(inputs)

    def generate_kwargs(self, max_new_tokens: int) -> Dict[str, Any]:
        return {
            "max_new_tokens": int(max_new_tokens),
            "do_sample": False,
            "use_cache": True,
        }

    def decode_text(self, processor, generated_ids) -> str:
        tok = getattr(processor, "tokenizer", processor)
        return tok.decode(generated_ids, skip_special_tokens=True)

    # -- Teacher protocol -------------------------------------------------------

    def run(
        self, image: pathlib.Path, prompt: str, max_new_tokens: int
    ) -> TeacherResult:
        import torch

        torch.manual_seed(0)
        np.random.seed(0)

        t0 = time.perf_counter()
        processor = self.load_processor()
        model = self.load_model(torch)
        load_time_s = time.perf_counter() - t0

        rendered, inputs = self.prepare_inputs(processor, image, prompt, torch)
        prompt_ids = inputs["input_ids"][0].tolist()

        t1 = time.perf_counter()
        with torch.no_grad():
            out = model.generate(**inputs, **self.generate_kwargs(max_new_tokens))
        infer_time_s = time.perf_counter() - t1

        generated = out[0][len(prompt_ids):].tolist()
        text = self.decode_text(processor, generated)
        import transformers

        return TeacherResult(
            rendered_prompt=rendered,
            prompt_tokens=[int(t) for t in prompt_ids],
            generated_tokens=[int(t) for t in generated],
            text=text,
            load_time_s=load_time_s,
            infer_time_s=infer_time_s,
            extra={
                "transformers_version": transformers.__version__,
                "torch_version": torch.__version__,
                "family": self.model_id,
            },
        )
