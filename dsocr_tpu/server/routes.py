"""aiohttp route handlers (ref crates/server/src/routes.rs:224-232).

GET  /v1/health            → {"status": "ok"}
GET  /v1/models            → registry entries with owned_by per kind
POST /v1/responses         → Responses API (max_output_tokens|max_tokens)
POST /v1/chat/completions  → Chat Completions API

Both POST routes accept flattened DecodeParametersPatch fields, stream
SSE when `stream: true`, and return the bilingual missing-image fallback
markdown when the prompt carries no `<image>`.
"""

from __future__ import annotations

import asyncio
import functools
from typing import Any, Dict, List

from aiohttp import web

from ..core import DecodeOutcome, VisionSettings, render_prompt
from ..core.engine import ModelKind
from ..core.params import DecodeParametersPatch
from .messages import (
    ApiError,
    MISSING_IMAGE_MARKDOWN,
    convert_messages,
    prompt_missing_image,
)
from .scheduler import QueueDepthExceeded
from .state import AppState
from .stream import ChatStream, ResponsesStream, new_id, now, sse

OWNED_BY = {
    ModelKind.DEEPSEEK: "deepseek-ocr",
    ModelKind.PADDLE_OCR_VL: "paddleocr-vl",
    ModelKind.DOTS_OCR: "dots-ocr",
    ModelKind.GLM_OCR: "glm-ocr",
}


def _state(request: web.Request) -> AppState:
    return request.app["state"]


async def health(request: web.Request) -> web.Response:
    return web.json_response({"status": "ok"})


async def models(request: web.Request) -> web.Response:
    state = _state(request)
    created = now()
    data = [
        {
            "id": model_id,
            "object": "model",
            "created": created,
            "owned_by": OWNED_BY[entry.kind],
        }
        for model_id, entry in sorted(state.config.models.entries.items())
    ]
    return web.json_response({"object": "list", "data": data})


def _usage(outcome: DecodeOutcome) -> Dict[str, int]:
    return {
        "prompt_tokens": outcome.prompt_tokens,
        "completion_tokens": outcome.response_tokens,
        "total_tokens": outcome.prompt_tokens + outcome.response_tokens,
    }


async def _decode(
    state: AppState,
    model_id: str,
    prompt: str,
    images: List[Any],
    patch: DecodeParametersPatch,
    stream_cb=None,
) -> DecodeOutcome:
    import time as _time

    loaded = await state.ensure_model_loaded(model_id)
    settings = state.model_settings(model_id)
    settings.decode += patch
    rendered = render_prompt(settings.template, "", prompt)
    vision = VisionSettings(
        base_size=settings.base_size,
        image_size=settings.image_size,
        crop_mode=settings.crop_mode,
    )
    loop = asyncio.get_running_loop()
    state.metrics["requests_total"] += 1
    t0 = _time.perf_counter()
    scheduler = state.scheduler
    can_schedule = scheduler is not None and (
        stream_cb is None or getattr(scheduler, "supports_streaming", False)
    )
    try:
        if can_schedule and stream_cb is not None:
            # continuous batching: streaming requests join the slot loop
            # and receive deltas at every chunk boundary
            outcome = await scheduler.submit(
                rendered, images, vision, settings.decode, stream_cb=stream_cb
            )
        elif can_schedule:
            outcome = await scheduler.submit(
                rendered, images, vision, settings.decode
            )
        else:
            async with state.lock:  # serialize on the single model slot
                outcome = await loop.run_in_executor(
                    None,
                    functools.partial(
                        loaded.engine.decode,
                        loaded.tokenizer,
                        rendered,
                        images,
                        vision,
                        settings.decode,
                        stream=stream_cb,
                    ),
                )
    except Exception:
        state.metrics["requests_failed"] += 1
        raise
    state.metrics["decode_seconds_total"] += _time.perf_counter() - t0
    state.metrics["prompt_tokens_total"] += outcome.prompt_tokens
    state.metrics["completion_tokens_total"] += outcome.response_tokens
    return outcome


async def metrics(request: web.Request) -> web.Response:
    """Prometheus text exposition of serving counters."""
    state = _state(request)
    lines = []
    for name, value in state.metrics.items():
        lines.append(f"# TYPE dsocr_{name} counter")
        lines.append(f"dsocr_{name} {value}")
    sched = state.scheduler
    if sched is not None and getattr(sched, "batch_sizes", None):
        occ = sched.batch_sizes
        lines.append("# TYPE dsocr_slot_occupancy gauge")
        lines.append(f"dsocr_slot_occupancy {occ[-1]}")
        lines.append("# TYPE dsocr_slot_occupancy_mean gauge")
        lines.append(f"dsocr_slot_occupancy_mean {sum(occ) / len(occ):.3f}")
        lines.append("# TYPE dsocr_decode_chunks_total counter")
        lines.append(f"dsocr_decode_chunks_total {len(occ)}")
        spec = getattr(sched, "speculated_chunks", None)
        if spec is not None:
            lines.append("# TYPE dsocr_speculated_chunks_total counter")
            lines.append(f"dsocr_speculated_chunks_total {spec}")
        rec = getattr(sched, "recoveries", None)
        if rec is not None:
            lines.append("# TYPE dsocr_device_fault_recoveries_total counter")
            lines.append(f"dsocr_device_fault_recoveries_total {rec}")
    shed = getattr(sched, "shed_requests", None)
    if shed is not None:
        lines.append("# TYPE dsocr_shed_requests_total counter")
        lines.append(f"dsocr_shed_requests_total {shed}")
    ttft = getattr(sched, "ttft_samples", None)
    if ttft:
        import numpy as _np

        p50, p95 = _np.percentile(list(ttft), [50, 95])
        lines.append("# TYPE dsocr_ttft_seconds_p50 gauge")
        lines.append(f"dsocr_ttft_seconds_p50 {p50:.4f}")
        lines.append("# TYPE dsocr_ttft_seconds_p95 gauge")
        lines.append(f"dsocr_ttft_seconds_p95 {p95:.4f}")
        lines.append("# TYPE dsocr_ttft_samples_total counter")
        lines.append(f"dsocr_ttft_samples_total {len(ttft)}")
    pcache = getattr(sched, "prefix_cache", None)
    if pcache is not None:
        lines.append("# TYPE dsocr_prefix_cache_hits_total counter")
        lines.append(f"dsocr_prefix_cache_hits_total {pcache.hits}")
        lines.append("# TYPE dsocr_prefix_cache_misses_total counter")
        lines.append(f"dsocr_prefix_cache_misses_total {pcache.misses}")
        lines.append("# TYPE dsocr_prefix_cache_entries gauge")
        lines.append(f"dsocr_prefix_cache_entries {len(pcache)}")
    return web.Response(
        text="\n".join(lines) + "\n", content_type="text/plain"
    )


def _patch_from_request(body: Dict[str, Any], max_tokens) -> DecodeParametersPatch:
    patch = DecodeParametersPatch.from_mapping(body)
    if max_tokens is not None:
        patch = DecodeParametersPatch(max_new_tokens=max_tokens).merged_over(patch)
    return patch


async def _stream_decode(
    request: web.Request,
    state: AppState,
    model_id: str,
    prompt: str,
    images,
    patch,
    streamer,
) -> web.StreamResponse:
    response = web.StreamResponse(
        headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
        }
    )
    await response.prepare(request)
    await response.write(streamer.initial())

    loaded = await state.ensure_model_loaded(model_id)
    loop = asyncio.get_running_loop()
    queue: asyncio.Queue = asyncio.Queue()

    def stream_cb(step: int, tokens: List[int]) -> None:
        text = loaded.tokenizer.decode(tokens, skip_special_tokens=True)
        loop.call_soon_threadsafe(queue.put_nowait, ("delta", text))

    async def run():
        try:
            outcome = await _decode(state, model_id, prompt, images, patch, stream_cb)
            await queue.put(("done", outcome))
        except Exception as err:  # error chunk mid-stream (stream.rs:33-64)
            await queue.put(("error", err))

    task = asyncio.create_task(run())
    try:
        while True:
            kind, payload = await queue.get()
            if kind == "delta":
                chunk = streamer.advance(payload)
                if chunk:
                    await response.write(chunk)
            elif kind == "done":
                outcome: DecodeOutcome = payload
                final = streamer.advance(outcome.text, is_final=True)
                if final:
                    await response.write(final)
                if isinstance(streamer, ResponsesStream):
                    for chunk in streamer.finish(
                        outcome.text, outcome.prompt_tokens, outcome.response_tokens
                    ):
                        await response.write(chunk)
                else:
                    for chunk in streamer.finish(
                        outcome.prompt_tokens, outcome.response_tokens
                    ):
                        await response.write(chunk)
                break
            else:
                err = payload
                message = err.message if isinstance(err, ApiError) else str(err)
                await response.write(
                    sse({"error": {"message": message, "type": "server_error"}})
                )
                await response.write(sse("[DONE]"))
                break
    finally:
        await task
    await response.write_eof()
    return response


async def _stream_fallback(request, streamer, text: str) -> web.StreamResponse:
    response = web.StreamResponse(
        headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
    )
    await response.prepare(request)
    await response.write(streamer.initial())
    chunk = streamer.advance(text, is_final=True)
    if chunk:
        await response.write(chunk)
    if isinstance(streamer, ResponsesStream):
        for c in streamer.finish(text, 0, 0):
            await response.write(c)
    else:
        for c in streamer.finish(0, 0):
            await response.write(c)
    await response.write_eof()
    return response


async def chat_completions(request: web.Request) -> web.StreamResponse:
    state = _state(request)
    body = await request.json()
    model_id = body.get("model") or state.config.models.active
    state.validate_model(model_id)
    prompt, images = convert_messages(body.get("messages") or [])
    streaming = bool(body.get("stream"))
    patch = _patch_from_request(body, body.get("max_tokens"))

    if prompt_missing_image(prompt) and not images:
        text = MISSING_IMAGE_MARKDOWN
        if streaming:
            return await _stream_fallback(request, ChatStream(model_id), text)
        return web.json_response(_chat_response(model_id, text, 0, 0))

    if prompt_missing_image(prompt):
        prompt = "<image>\n" + prompt if prompt else "<image>"

    if streaming:
        return await _stream_decode(
            request, state, model_id, prompt, images, patch, ChatStream(model_id)
        )
    outcome = await _decode(state, model_id, prompt, images, patch)
    return web.json_response(
        _chat_response(
            model_id, outcome.text, outcome.prompt_tokens, outcome.response_tokens
        )
    )


def _chat_response(model: str, text: str, prompt_tokens: int, completion_tokens: int):
    return {
        "id": new_id("chatcmpl"),
        "object": "chat.completion",
        "created": now(),
        "model": model,
        "choices": [
            {
                "index": 0,
                "message": {"role": "assistant", "content": text},
                "finish_reason": "stop",
            }
        ],
        "usage": {
            "prompt_tokens": prompt_tokens,
            "completion_tokens": completion_tokens,
            "total_tokens": prompt_tokens + completion_tokens,
        },
    }


def _responses_response(model: str, text: str, prompt_tokens: int, completion_tokens: int):
    return {
        "id": new_id("resp"),
        "object": "response",
        "created": now(),
        "model": model,
        "output": [
            {
                "id": new_id("msg"),
                "type": "message",
                "role": "assistant",
                "content": [{"type": "output_text", "text": text}],
            }
        ],
        "usage": {
            "prompt_tokens": prompt_tokens,
            "completion_tokens": completion_tokens,
            "total_tokens": prompt_tokens + completion_tokens,
        },
    }


async def responses(request: web.Request) -> web.StreamResponse:
    state = _state(request)
    body = await request.json()
    model_id = body.get("model") or state.config.models.active
    state.validate_model(model_id)
    prompt, images = convert_messages(body.get("input") or [])
    streaming = bool(body.get("stream"))
    max_tokens = body.get("max_output_tokens") or body.get("max_tokens")
    patch = _patch_from_request(body, max_tokens)

    if prompt_missing_image(prompt) and not images:
        text = MISSING_IMAGE_MARKDOWN
        if streaming:
            return await _stream_fallback(request, ResponsesStream(model_id), text)
        return web.json_response(_responses_response(model_id, text, 0, 0))

    if prompt_missing_image(prompt):
        prompt = "<image>\n" + prompt if prompt else "<image>"

    if streaming:
        return await _stream_decode(
            request, state, model_id, prompt, images, patch, ResponsesStream(model_id)
        )
    outcome = await _decode(state, model_id, prompt, images, patch)
    return web.json_response(
        _responses_response(
            model_id, outcome.text, outcome.prompt_tokens, outcome.response_tokens
        )
    )


@web.middleware
async def error_middleware(request: web.Request, handler):
    try:
        return await handler(request)
    except ApiError as err:
        return web.json_response(err.body(), status=err.status)
    except QueueDepthExceeded as err:
        # tail-TTFT load shedding (DSOCR_MAX_INFLIGHT): waiting moves
        # upstream where clients can retry/back off instead of inflating
        # in-server queue wait
        return web.json_response(
            {"error": {"message": str(err), "type": "overloaded_error"}},
            status=503,
            headers={"Retry-After": str(int(err.retry_after_s))},
        )
    except web.HTTPException:
        raise
    except ValueError as err:
        # request-attributable validation failures (e.g. ngram beyond the
        # slot runtime limit, prompt over KV capacity) are client errors
        return web.json_response(
            {"error": {"message": str(err), "type": "invalid_request_error"}},
            status=400,
        )
    except Exception as err:
        return web.json_response(
            {"error": {"message": str(err), "type": "server_error"}}, status=500
        )


@web.middleware
async def cors_middleware(request: web.Request, handler):
    if request.method == "OPTIONS":
        response = web.Response()
    else:
        response = await handler(request)
    response.headers["Access-Control-Allow-Origin"] = "*"
    response.headers["Access-Control-Allow-Methods"] = "GET, POST, OPTIONS"
    response.headers["Access-Control-Allow-Headers"] = "Authorization, Content-Type"
    return response


def build_app(state: AppState) -> web.Application:
    app = web.Application(
        middlewares=[cors_middleware, error_middleware],
        client_max_size=50 * 1024 * 1024,  # 50 MB JSON limit (ref app.rs:39-47)
    )
    app["state"] = state
    app.router.add_get("/v1/health", health)
    app.router.add_get("/v1/models", models)
    app.router.add_get("/metrics", metrics)
    app.router.add_post("/v1/responses", responses)
    app.router.add_post("/v1/chat/completions", chat_completions)
    return app
