"""Performance matrix with history comparison.

Mirrors benchsuite perf/matrix-gate semantics (orchestrator.py:199-254,
524-595): run a model×dtype matrix, record per-stage totals using the
same stage-event JSON schema as the reference CLI, and compare against
the previous run's history file.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import time
from typing import Any, Dict, List, Optional


@dataclasses.dataclass
class PerfEntry:
    model: str
    dtype: str
    stage_totals: Dict[str, float]
    wall_s: float
    tokens_per_sec: float
    quant: str = ""  # '' (dense) | q8_0 | q4_k | q6_k
    mode: str = "single"  # single | serve (continuous batching)
    pages_per_sec: float = 0.0
    kv_quant: str = ""  # '' (dense KV) | int8


def _norm_stages(stages: Dict[str, float]) -> Dict[str, float]:
    """Fold renamed/split stages into comparable totals: the streamed
    prefill path books host prep under `slot.prepare_inputs.overlapped`
    while `slot.prepare_inputs` reads ~0 (r3 rename, ADVICE r3 #3) —
    history entries recorded before/after the rename would otherwise
    show a spurious regression/improvement pair."""
    out = dict(stages)
    ov = out.pop("slot.prepare_inputs.overlapped", 0.0)
    if ov:
        out["slot.prepare_inputs"] = out.get("slot.prepare_inputs", 0.0) + ov
    return out


def compare_history(
    current: List[PerfEntry], history_path: pathlib.Path, tolerance: float = 0.15
) -> Dict[str, Any]:
    """Report per-stage regressions vs the stored previous run."""
    report: Dict[str, Any] = {"regressions": [], "improvements": [], "new": []}
    if not pathlib.Path(history_path).exists():
        report["note"] = "no history; baseline recorded"
        return report
    history = json.loads(pathlib.Path(history_path).read_text())
    prev = {
        (
            e["model"], e["dtype"], e.get("quant", ""),
            e.get("mode", "single"), e.get("kv_quant", ""),
        ): e
        for e in history.get("entries", [])
    }
    for entry in current:
        key = (entry.model, entry.dtype, entry.quant, entry.mode, entry.kv_quant)
        if key not in prev:
            report["new"].append(f"{entry.model}/{entry.dtype}")
            continue
        label = "/".join(
            filter(
                None,
                (entry.model, entry.dtype, entry.quant, entry.kv_quant, entry.mode),
            )
        )
        old_stages = _norm_stages(prev[key].get("stage_totals", {}))
        for stage, value in _norm_stages(entry.stage_totals).items():
            old = old_stages.get(stage)
            if old is None or old <= 0:
                continue
            ratio = value / old
            line = f"{label} {stage}: {old:.1f} -> {value:.1f} ms"
            if ratio > 1 + tolerance:
                report["regressions"].append(line)
            elif ratio < 1 - tolerance:
                report["improvements"].append(line)
    return report


def save_history(entries: List[PerfEntry], path: pathlib.Path) -> None:
    payload = {
        "recorded_at": time.time(),
        "entries": [dataclasses.asdict(e) for e in entries],
    }
    pathlib.Path(path).write_text(json.dumps(payload, indent=2))


def run_perf_matrix(
    models: List[str],
    dtypes: List[str],
    image_path: pathlib.Path,
    prompt: str = "<image>\nFree OCR.",
    max_new_tokens: int = 64,
    quants: Optional[List[str]] = None,  # '' | q8_0 | q4_k | q6_k
    modes: Optional[List[str]] = None,  # single | serve
    kv_quants: Optional[List[str]] = None,  # '' | int8
    n_requests: int = 4,
    warmup: bool = True,
    on_entry=None,  # callback(entries_so_far) after each cell (incremental save)
    skip_failures: bool = True,  # a wedged cell must not lose the session
) -> List[PerfEntry]:
    """Run the model × dtype × quant × serving-mode matrix in-process
    with random-init weights (no weights ship with this machine);
    stage totals use the reference's stage-event schema
    (orchestrator.py:199-254). 'serve' drives the continuous-batching
    scheduler with n_requests concurrent pages — the axis the
    mutex-serialized reference cannot measure."""
    import gc
    import sys

    import numpy as np
    from PIL import Image

    from ..core import DecodeParameters, VisionSettings
    from ..core.benchmark import BenchRecorder, set_recorder
    from ..models.registry import load_engine
    from ..core.engine import ModelKind

    kind_of = {
        "deepseek-ocr": ModelKind.DEEPSEEK,
        "deepseek-ocr-2": ModelKind.DEEPSEEK,
        "paddleocr-vl": ModelKind.PADDLE_OCR_VL,
        "dots-ocr": ModelKind.DOTS_OCR,
        "glm-ocr": ModelKind.GLM_OCR,
    }
    quants = [""] if quants is None else quants
    modes = ["single"] if modes is None else modes
    kv_quants = [""] if kv_quants is None else kv_quants

    class _Tok:
        def encode(self, t):
            return [(ord(c) * 7 + 13) % 50000 for c in t]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(map(str, ids))

        def token_to_id(self, t):
            return 128815 if t == "<image>" else None

    image = np.asarray(Image.open(image_path).convert("RGB"))
    entries = []
    for model in models:
        for dtype in dtypes:
            for quant, kvq in [
                (q, kv) for q in quants for kv in kv_quants
            ]:
                if quant and model == "glm-ocr":
                    continue  # no GLM DSQ adapter (matches the reference)
                try:
                    engine = load_engine(
                        kind_of[model], dtype=dtype, quantize=quant or None,
                        kv_quant=kvq or None,
                    )
                except Exception as err:
                    if not skip_failures:
                        raise
                    print(
                        f"[perf] engine {model}/{dtype}/{quant}/{kvq} failed "
                        f"to load ({type(err).__name__}: {err}); skipping",
                        file=sys.stderr,
                    )
                    continue
                params = DecodeParameters(max_new_tokens=max_new_tokens)
                if model == "glm-ocr":
                    settings = VisionSettings(336, 336, False)
                else:
                    settings = VisionSettings(1024, 640, model.startswith("deepseek"))
                for mode in modes:
                    if mode == "serve" and not hasattr(engine, "make_slot_runner"):
                        continue

                    def run_cell():
                        t0 = time.perf_counter()
                        if mode == "serve":
                            import asyncio

                            from ..server.scheduler import ContinuousScheduler

                            sched = ContinuousScheduler(
                                engine, _Tok(), n_slots=min(8, n_requests)
                            )

                            async def _serve():
                                return await asyncio.gather(*(
                                    sched.submit(
                                        prompt, [image], settings, params
                                    )
                                    for _ in range(n_requests)
                                ))

                            outs = asyncio.run(_serve())
                            tokens = sum(o.response_tokens for o in outs)
                            pages = n_requests
                        else:
                            out = engine.decode(
                                _Tok(), prompt, [image], settings, params
                            )
                            tokens, pages = out.response_tokens, 1
                        return tokens, pages, time.perf_counter() - t0

                    try:
                        if warmup:
                            # untimed pass: compiles (minutes-long on the
                            # tunneled TPU, even with the disk cache on a
                            # first run) must not pollute the history —
                            # the matrix tracks steady-state regressions
                            run_cell()
                        recorder = BenchRecorder()
                        set_recorder(recorder)
                        tokens, pages, wall = run_cell()
                    except Exception as err:
                        set_recorder(None)
                        if not skip_failures:
                            raise
                        print(
                            f"[perf] cell {model}/{dtype}/{quant}/{kvq}/"
                            f"{mode} failed ({type(err).__name__}: {err}); "
                            "skipping",
                            file=sys.stderr,
                        )
                        continue
                    set_recorder(None)
                    entries.append(
                        PerfEntry(
                            model=model,
                            dtype=dtype,
                            quant=quant,
                            kv_quant=kvq,
                            mode=mode,
                            stage_totals=recorder.stage_totals(),
                            wall_s=wall,
                            tokens_per_sec=tokens / wall if wall else 0.0,
                            pages_per_sec=pages / wall if wall else 0.0,
                        )
                    )
                    if on_entry is not None:
                        on_entry(list(entries))
                # free HBM before the next family loads: drop the params
                # AND the jitted executables holding buffer references
                # (glm OOM'd behind three resident families otherwise)
                del engine
                gc.collect()
                try:
                    import jax

                    jax.clear_caches()
                except Exception:
                    pass
    return entries
