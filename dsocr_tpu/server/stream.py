"""SSE chunk construction for the two streaming APIs.

Chunk payload schemas are identical to crates/server/src/stream.rs:
chat: role-first chunk → content deltas → finish chunk with usage →
[DONE]; responses: response.created → response.output_text.delta →
response.completed → [DONE]. Deltas come through a DeltaTracker so
partial UTF-8 never leaks.
"""

from __future__ import annotations

import json
import time
import uuid
from typing import List, Optional

from ..core.streaming import DeltaTracker


def now() -> int:
    return int(time.time())


def new_id(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4()}"


def sse(data) -> bytes:
    if isinstance(data, str):
        return f"data: {data}\n\n".encode()
    return f"data: {json.dumps(data, ensure_ascii=False)}\n\n".encode()


class ChatStream:
    def __init__(self, model: str):
        self.completion_id = new_id("chatcmpl")
        self.model = model
        self.created = now()
        self.delta = DeltaTracker()
        self.role_sent = False

    def initial(self) -> bytes:
        self.role_sent = True
        return sse(
            {
                "id": self.completion_id,
                "object": "chat.completion.chunk",
                "created": self.created,
                "model": self.model,
                "choices": [
                    {"index": 0, "delta": {"role": "assistant"}, "finish_reason": None}
                ],
            }
        )

    def delta_chunk(self, text: str, include_role: bool = False) -> bytes:
        delta = {"content": text}
        if include_role:
            delta["role"] = "assistant"
        return sse(
            {
                "id": self.completion_id,
                "object": "chat.completion.chunk",
                "created": self.created,
                "model": self.model,
                "choices": [{"index": 0, "delta": delta, "finish_reason": None}],
            }
        )

    def advance(self, full_text: str, is_final: bool = False) -> Optional[bytes]:
        piece = self.delta.advance(full_text, is_final)
        include_role = not self.role_sent
        if piece or include_role:
            self.role_sent = True
            return self.delta_chunk(piece, include_role)
        return None

    def finish(self, prompt_tokens: int, completion_tokens: int) -> List[bytes]:
        return [
            sse(
                {
                    "id": self.completion_id,
                    "object": "chat.completion.chunk",
                    "created": self.created,
                    "model": self.model,
                    "choices": [{"index": 0, "delta": {}, "finish_reason": "stop"}],
                    "usage": {
                        "prompt_tokens": prompt_tokens,
                        "completion_tokens": completion_tokens,
                        "total_tokens": prompt_tokens + completion_tokens,
                    },
                }
            ),
            sse("[DONE]"),
        ]


class ResponsesStream:
    def __init__(self, model: str):
        self.response_id = new_id("resp")
        self.output_id = new_id("msg")
        self.model = model
        self.created = now()
        self.delta = DeltaTracker()

    def _response_head(self) -> dict:
        return {
            "id": self.response_id,
            "object": "response",
            "created": self.created,
            "model": self.model,
        }

    def initial(self) -> bytes:
        return sse({"type": "response.created", "response": self._response_head()})

    def advance(self, full_text: str, is_final: bool = False) -> Optional[bytes]:
        piece = self.delta.advance(full_text, is_final)
        if not piece:
            return None
        return sse(
            {
                "type": "response.output_text.delta",
                "response": self._response_head(),
                "output_id": self.output_id,
                "output_index": 0,
                "delta": piece,
            }
        )

    def finish(self, text: str, prompt_tokens: int, completion_tokens: int) -> List[bytes]:
        payload = {
            "type": "response.completed",
            "response": {
                **self._response_head(),
                "output": [
                    {
                        "id": self.output_id,
                        "type": "message",
                        "role": "assistant",
                        "content": [{"type": "output_text", "text": text}],
                    }
                ],
                "usage": {
                    "input_tokens": prompt_tokens,
                    "output_tokens": completion_tokens,
                    "total_tokens": prompt_tokens + completion_tokens,
                },
            },
        }
        return [sse(payload), sse("[DONE]")]
