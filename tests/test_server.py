"""OpenAI-compatible server: routes, schemas, streaming, fallbacks
(contracts: crates/server/src/{routes,stream,generation}.rs)."""

import asyncio
import base64
import io
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer
from PIL import Image

from dsocr_tpu.config import AppConfig
from dsocr_tpu.server.messages import ApiError, convert_messages
from dsocr_tpu.server.routes import build_app
from dsocr_tpu.server.state import AppState


def _data_url(size=(28, 28)) -> str:
    img = np.random.default_rng(0).integers(0, 256, (*size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return "data:image/png;base64," + base64.standard_b64encode(buf.getvalue()).decode()


# -- message conversion -------------------------------------------------------


def test_convert_messages_collapses_history():
    messages = [
        {"role": "system", "content": "sys prompt"},
        {"role": "user", "content": "old turn"},
        {"role": "assistant", "content": "old answer"},
        {"role": "user", "content": "new question"},
    ]
    prompt, images = convert_messages(messages)
    assert prompt == "sys prompt\n\nnew question"
    assert images == []


def test_convert_messages_parts_reversed_order():
    messages = [
        {
            "role": "user",
            "content": [
                {"type": "text", "text": "Read this."},
                {"type": "image_url", "image_url": {"url": _data_url()}},
            ],
        }
    ]
    prompt, images = convert_messages(messages)
    # reference flattens parts in reverse: image placeholder first
    assert prompt.startswith("<image>")
    assert "Read this." in prompt
    assert len(images) == 1 and images[0].shape == (28, 28, 3)


def test_convert_messages_requires_user():
    with pytest.raises(ApiError):
        convert_messages([{"role": "system", "content": "x"}])


def test_convert_messages_rejects_file_urls():
    with pytest.raises(ApiError, match="data: URIs or http"):
        convert_messages(
            [
                {
                    "role": "user",
                    "content": [
                        {"type": "image_url", "image_url": {"url": "file:///etc/passwd"}}
                    ],
                }
            ]
        )


# -- HTTP routes ---------------------------------------------------------------


class FakeEngine:
    """Deterministic engine double so route tests don't need model loads."""

    def decode(self, tokenizer, prompt, images, vision, params, stream=None):
        from dsocr_tpu.core import DecodeOutcome

        if stream is not None:
            stream(1, [1])
            stream(2, [1, 2])
        return DecodeOutcome(
            text=f"OCR[{len(images)} imgs]",
            prompt_tokens=7,
            response_tokens=2,
            generated_tokens=[1, 2],
        )


class FakeTokenizer:
    def decode(self, ids, skip_special_tokens=True):
        # prefix-consistent partial decodes, like a real tokenizer
        return "OCR[1 imgs]"[: len(ids) * 4]

    def encode(self, text):
        return [1]

    def token_to_id(self, token):
        return None


def _make_state():
    from dsocr_tpu.core.engine import ModelKind
    from dsocr_tpu.server.state import LoadedModel

    def factory(model_id):
        return LoadedModel(
            model_id=model_id,
            engine=FakeEngine(),
            tokenizer=FakeTokenizer(),
            kind=ModelKind.PADDLE_OCR_VL,
        )

    return AppState(AppConfig(), allow_download=False, engine_factory=factory)


def _request(method, path, json_body=None, parse_sse=False):
    async def go():
        app = build_app(_make_state())
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            if method == "GET":
                resp = await client.get(path)
            else:
                resp = await client.post(path, json=json_body)
            if parse_sse:
                raw = await resp.text()
                return resp.status, raw
            return resp.status, await resp.json()
        finally:
            await client.close()

    return asyncio.run(go())


def test_health():
    status, body = _request("GET", "/v1/health")
    assert status == 200 and body == {"status": "ok"}


def test_models_listing():
    status, body = _request("GET", "/v1/models")
    assert status == 200
    assert body["object"] == "list"
    ids = [m["id"] for m in body["data"]]
    assert "deepseek-ocr" in ids and "paddleocr-vl-q6k" in ids
    owned = {m["id"]: m["owned_by"] for m in body["data"]}
    assert owned["glm-ocr"] == "glm-ocr"
    assert owned["deepseek-ocr-q4k"] == "deepseek-ocr"


def test_chat_completion_basic():
    status, body = _request(
        "POST",
        "/v1/chat/completions",
        {
            "model": "paddleocr-vl",
            "messages": [
                {
                    "role": "user",
                    "content": [
                        {"type": "text", "text": "Free OCR."},
                        {"type": "image_url", "image_url": {"url": _data_url()}},
                    ],
                }
            ],
        },
    )
    assert status == 200
    assert body["object"] == "chat.completion"
    assert body["choices"][0]["message"]["content"] == "OCR[1 imgs]"
    assert body["choices"][0]["finish_reason"] == "stop"
    assert body["usage"] == {
        "prompt_tokens": 7,
        "completion_tokens": 2,
        "total_tokens": 9,
    }


def test_chat_missing_image_fallback():
    status, body = _request(
        "POST",
        "/v1/chat/completions",
        {"model": "paddleocr-vl", "messages": [{"role": "user", "content": "hi"}]},
    )
    assert status == 200
    content = body["choices"][0]["message"]["content"]
    assert "Image Required" in content and "需要图像输入" in content


def test_chat_unknown_model_error_shape():
    status, body = _request(
        "POST",
        "/v1/chat/completions",
        {"model": "bogus", "messages": [{"role": "user", "content": "x"}]},
    )
    assert status == 400
    assert body["error"]["type"] == "invalid_request_error"
    assert "not registered" in body["error"]["message"]


def test_responses_api_max_output_tokens():
    status, body = _request(
        "POST",
        "/v1/responses",
        {
            "model": "paddleocr-vl",
            "input": [
                {
                    "role": "user",
                    "content": [
                        {"type": "input_text", "text": "OCR"},
                        {"type": "input_image", "image_url": _data_url()},
                    ],
                }
            ],
            "max_output_tokens": 5,
        },
    )
    assert status == 200
    assert body["object"] == "response"
    assert body["output"][0]["content"][0]["type"] == "output_text"
    assert body["output"][0]["content"][0]["text"] == "OCR[1 imgs]"


def test_chat_streaming_sse():
    status, raw = _request(
        "POST",
        "/v1/chat/completions",
        {
            "model": "paddleocr-vl",
            "stream": True,
            "messages": [
                {
                    "role": "user",
                    "content": [
                        {"type": "text", "text": "Free OCR."},
                        {"type": "image_url", "image_url": {"url": _data_url()}},
                    ],
                }
            ],
        },
        parse_sse=True,
    )
    assert status == 200
    events = [line[6:] for line in raw.splitlines() if line.startswith("data: ")]
    assert events[-1] == "[DONE]"
    first = json.loads(events[0])
    assert first["choices"][0]["delta"] == {"role": "assistant"}
    finish = json.loads(events[-2])
    assert finish["choices"][0]["finish_reason"] == "stop"
    assert finish["usage"]["total_tokens"] == 9
    # concatenated deltas equal the final text
    text = "".join(
        json.loads(e)["choices"][0]["delta"].get("content", "")
        for e in events[1:-2]
    )
    assert text == "OCR[1 imgs]"


def test_responses_streaming_sse():
    status, raw = _request(
        "POST",
        "/v1/responses",
        {
            "model": "paddleocr-vl",
            "stream": True,
            "input": [
                {
                    "role": "user",
                    "content": [{"type": "input_image", "image_url": _data_url()}],
                }
            ],
        },
        parse_sse=True,
    )
    assert status == 200
    events = [line[6:] for line in raw.splitlines() if line.startswith("data: ")]
    assert events[-1] == "[DONE]"
    assert json.loads(events[0])["type"] == "response.created"
    completed = json.loads(events[-2])
    assert completed["type"] == "response.completed"
    assert completed["response"]["output"][0]["content"][0]["text"] == "OCR[1 imgs]"


def test_cors_headers():
    status, _ = _request("GET", "/v1/health")

    async def go():
        app = build_app(_make_state())
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.options("/v1/chat/completions")
            return resp.headers
        finally:
            await client.close()

    headers = asyncio.run(go())
    assert headers["Access-Control-Allow-Origin"] == "*"


def test_metrics_endpoint():
    async def go():
        app = build_app(_make_state())
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            await client.post(
                "/v1/chat/completions",
                json={
                    "model": "paddleocr-vl",
                    "messages": [
                        {
                            "role": "user",
                            "content": [
                                {"type": "image_url", "image_url": {"url": _data_url()}}
                            ],
                        }
                    ],
                },
            )
            resp = await client.get("/metrics")
            return resp.status, await resp.text()
        finally:
            await client.close()

    status, text = asyncio.run(go())
    assert status == 200
    assert "dsocr_requests_total 1" in text
    assert "dsocr_completion_tokens_total 2" in text
