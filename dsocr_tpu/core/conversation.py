"""Conversation template registry.

Prompt-rendering parity with the reference registry
(``crates/core/src/conversation/mod.rs:53-252``): four built-in templates
(deepseek, deepseekv2, plain, alignment) over four separator styles.
Rendering must be byte-identical — the benchsuite gate compares rendered
prompts exactly.
"""

from __future__ import annotations

import dataclasses
import enum
import threading
from typing import Dict, List, Optional, Tuple


class SeparatorStyle(enum.Enum):
    DEEPSEEK = "deepseek"
    DEEPSEEK_V2 = "deepseekv2"
    PLAIN = "plain"
    ALIGNMENT = "alignment"


@dataclasses.dataclass
class ConversationTemplate:
    name: str = ""
    system_template: str = "{system_message}"
    system_message: str = ""
    roles: Tuple[str, str] = ("USER", "ASSISTANT")
    messages: List[Tuple[str, Optional[str]]] = dataclasses.field(default_factory=list)
    offset: int = 0
    sep_style: SeparatorStyle = SeparatorStyle.DEEPSEEK
    sep: str = "\n"
    sep2: Optional[str] = None
    stop_str: List[str] = dataclasses.field(default_factory=list)
    stop_token_ids: List[int] = dataclasses.field(default_factory=list)

    def set_system_message(self, system_message: str) -> None:
        self.system_message = system_message

    def append_message(self, role: str, message: Optional[str]) -> None:
        self.messages.append((role, message))

    def update_last_message(self, message: str) -> None:
        if self.messages:
            role, _ = self.messages[-1]
            self.messages[-1] = (role, message)

    def reset_messages(self) -> None:
        self.messages.clear()

    def copy(self) -> "ConversationTemplate":
        return dataclasses.replace(
            self,
            messages=list(self.messages),
            stop_str=list(self.stop_str),
            stop_token_ids=list(self.stop_token_ids),
        )

    # -- rendering ---------------------------------------------------------

    def get_prompt(self) -> str:
        if self.sep_style is SeparatorStyle.DEEPSEEK:
            return self._render_deepseek()
        if self.sep_style is SeparatorStyle.DEEPSEEK_V2:
            return self._render_deepseek_v2()
        if self.sep_style is SeparatorStyle.PLAIN:
            return self._render_plain()
        return self._render_alignment()

    def _seps(self) -> Tuple[str, str]:
        return (self.sep, self.sep2 if self.sep2 is not None else "")

    @staticmethod
    def _content(message: Optional[str]) -> Optional[str]:
        if message is None:
            return None
        trimmed = message.strip()
        return trimmed if trimmed else None

    def _render_deepseek(self) -> str:
        seps = self._seps()
        system_prompt = self.system_template.replace(
            "{system_message}", self.system_message
        )
        parts: List[str] = []
        if system_prompt:
            parts.append(system_prompt)
            parts.append(seps[0])
        for idx, (role, message) in enumerate(self.messages):
            content = self._content(message)
            if content is not None:
                parts.extend((role, ": ", content, seps[idx % 2]))
            else:
                parts.extend((role, ":"))
        return "".join(parts)

    def _render_deepseek_v2(self) -> str:
        seps = self._seps()
        system_prompt = self.system_template.replace(
            "{system_message}", self.system_message
        )
        parts: List[str] = []
        if system_prompt:
            parts.append(system_prompt)
            parts.append(seps[0])
        for role, message in self.messages:
            content = self._content(message)
            if content is None:
                continue
            if role == "User":
                parts.extend(("<｜sft▁begin｜>\n", content, seps[0]))
            else:
                parts.extend((content, seps[1]))
        return "".join(parts)

    def _render_plain(self) -> str:
        seps = self._seps()
        parts: List[str] = []
        for idx, (_, message) in enumerate(self.messages):
            content = self._content(message)
            if content is not None:
                parts.extend((content, seps[idx % 2]))
        return "".join(parts)

    def _render_alignment(self) -> str:
        seps = self._seps()
        parts: List[str] = []
        for idx, (_, message) in enumerate(self.messages):
            content = self._content(message)
            if content is None:
                continue
            if idx % 2 == 0:
                parts.extend(("<image>\n", seps[idx % 2]))
            else:
                parts.extend((content, seps[idx % 2]))
        return "".join(parts)


def _deepseek_template() -> ConversationTemplate:
    return ConversationTemplate(
        name="deepseek",
        system_template="{system_message}",
        roles=("<|User|>", "<|Assistant|>"),
        sep_style=SeparatorStyle.DEEPSEEK,
        sep="\n\n",
        sep2="<｜end▁of▁sentence｜>",
        stop_str=["User:", "<｜end▁of▁sentence｜>"],
        stop_token_ids=[100001],
    )


def _deepseek_v2_template() -> ConversationTemplate:
    return ConversationTemplate(
        name="deepseekv2",
        system_template="{system_message}",
        roles=("<｜User｜>", "<｜Assistant｜>"),
        sep_style=SeparatorStyle.DEEPSEEK,
        sep="",
        sep2="<｜end▁of▁sentence｜>",
        stop_str=["User:", "<｜end▁of▁sentence｜>"],
        stop_token_ids=[100001],
    )


def _plain_template() -> ConversationTemplate:
    return ConversationTemplate(
        name="plain",
        system_template="",
        roles=("", ""),
        sep_style=SeparatorStyle.PLAIN,
        sep="",
        sep2="",
        stop_str=["</s>"],
        stop_token_ids=[100001],
    )


def _alignment_template() -> ConversationTemplate:
    return ConversationTemplate(
        name="alignment",
        system_template="",
        roles=("", ""),
        sep_style=SeparatorStyle.ALIGNMENT,
        sep="",
        sep2="",
        stop_str=["</s>"],
        stop_token_ids=[100001],
    )


_REGISTRY_LOCK = threading.RLock()
_REGISTRY: Dict[str, ConversationTemplate] = {
    "deepseek": _deepseek_template(),
    "deepseekv2": _deepseek_v2_template(),
    "plain": _plain_template(),
    "alignment": _alignment_template(),
}


def register_conv_template(
    template: ConversationTemplate, override_existing: bool = False
) -> None:
    with _REGISTRY_LOCK:
        if not override_existing and template.name in _REGISTRY:
            raise ValueError(f"{template.name} has been registered")
        _REGISTRY[template.name] = template


def get_conv_template(name: str) -> Optional[ConversationTemplate]:
    with _REGISTRY_LOCK:
        template = _REGISTRY.get(name)
        return template.copy() if template is not None else None
