"""GLM-OCR teacher (strict-gate family, reference glm.py:19-23).

GLM tokenizes through ``apply_chat_template(tokenize=True)`` directly
(reference benchsuite/models/glm.py:64-91) and drops ``token_type_ids``.
The rendered prompt recorded in the artifact is the canonicalized user
prompt (reference normalize_prompt, base.py:192) — the rust/TPU side
rebuilds the [gMASK]<sop> scaffold itself (models/glm/engine.py)."""

from __future__ import annotations

import pathlib

from ._chat import ChatTemplateTeacher


class HFGlmTeacher(ChatTemplateTeacher):
    model_id = "glm-ocr"

    def load_model(self, torch):
        from transformers import AutoModelForCausalLM

        model = AutoModelForCausalLM.from_pretrained(
            str(self.model_dir),
            trust_remote_code=self.trust_remote_code,
            use_safetensors=True,
        )
        return model.to(torch.float32).eval().to(torch.device("cpu"))

    def prepare_inputs(self, processor, image: pathlib.Path, prompt: str, torch):
        messages = self.build_messages(image, prompt)
        inputs = processor.apply_chat_template(
            messages,
            tokenize=True,
            add_generation_prompt=True,
            return_dict=True,
            return_tensors="pt",
        )
        inputs = dict(inputs)
        inputs.pop("token_type_ids", None)
        rendered = prompt.strip()
        return rendered, inputs
