"""Provider-failover download engine.

Parity with crates/assets/src/providers: HuggingFace and ModelScope
providers ordered by a latency probe, first success wins; sharded
`.index.json` weights pull every referenced shard. All network access is
best-effort — air-gapped hosts get None and callers use local files.
"""

from __future__ import annotations

import json
import os
import pathlib
import time
from typing import List, Optional

from .manifests import MODEL_ASSETS, QUANTIZED_MODEL_ASSETS


class Provider:
    name = ""

    def url(self, repo_id: str, filename: str) -> str:
        raise NotImplementedError

    def probe_url(self) -> str:
        raise NotImplementedError


class HuggingFaceProvider(Provider):
    name = "huggingface"

    def url(self, repo_id: str, filename: str) -> str:
        base = os.environ.get("HF_ENDPOINT", "https://huggingface.co")
        return f"{base}/{repo_id}/resolve/main/{filename}"

    def probe_url(self) -> str:
        return os.environ.get("HF_ENDPOINT", "https://huggingface.co")


class ModelScopeProvider(Provider):
    name = "modelscope"

    def url(self, repo_id: str, filename: str) -> str:
        return (
            "https://modelscope.cn/api/v1/models/"
            f"{repo_id}/repo?FilePath={filename}"
        )

    def probe_url(self) -> str:
        return "https://modelscope.cn"


def _providers_by_latency(timeout: float = 2.0) -> List[Provider]:
    """Order providers by a HEAD-probe latency benchmark
    (ref providers/mod.rs:25-40)."""
    import requests

    providers = [HuggingFaceProvider(), ModelScopeProvider()]
    timed = []
    for p in providers:
        start = time.perf_counter()
        try:
            requests.head(p.probe_url(), timeout=timeout)
            timed.append((time.perf_counter() - start, p))
        except Exception:
            timed.append((float("inf"), p))
    timed.sort(key=lambda t: t[0])
    return [p for _, p in timed]


def download_file(
    repo_id: str, filename: str, dest: pathlib.Path, progress: bool = True
) -> Optional[pathlib.Path]:
    """Download one file with provider failover; returns None if all fail."""
    import requests

    dest = pathlib.Path(dest)
    if dest.exists():
        return dest
    dest.parent.mkdir(parents=True, exist_ok=True)
    headers = {}
    token = os.environ.get("HF_TOKEN")
    for provider in _providers_by_latency():
        url = provider.url(repo_id, filename)
        h = dict(headers)
        if provider.name == "huggingface" and token:
            h["Authorization"] = f"Bearer {token}"
        try:
            with requests.get(url, headers=h, stream=True, timeout=30) as resp:
                if resp.status_code != 200:
                    continue
                total = int(resp.headers.get("content-length", 0))
                done = 0
                tmp = dest.with_suffix(dest.suffix + ".part")
                with open(tmp, "wb") as fh:
                    for chunk in resp.iter_content(chunk_size=1 << 20):
                        fh.write(chunk)
                        done += len(chunk)
                        if progress and total:
                            pct = done * 100 // total
                            print(
                                f"\r{filename}: {pct}% ({done >> 20}/{total >> 20} MiB)",
                                end="",
                                flush=True,
                            )
                if progress and total:
                    print()
                tmp.rename(dest)
                return dest
        except Exception:
            continue
    return None


def ensure_model_asset(
    model_id: str, kind: str, dest: pathlib.Path
) -> Optional[pathlib.Path]:
    """Ensure one asset (config/tokenizer/weights/snapshot/preprocessor)
    exists at `dest`, downloading if needed. Sharded weight indices pull
    every referenced shard (ref assets/src/lib.rs:256-310)."""
    dest = pathlib.Path(dest)
    if dest.exists():
        return dest

    if kind == "snapshot":
        asset = QUANTIZED_MODEL_ASSETS.get(model_id)
        if asset is None:
            return None
        return download_file(asset.repo_id, asset.filename, dest)

    asset = MODEL_ASSETS.get(model_id)
    if asset is None:
        return None
    filename = {
        "config": asset.config,
        "tokenizer": asset.tokenizer,
        "weights": asset.weights,
        "preprocessor": asset.preprocessor,
    }.get(kind)
    if filename is None:
        return None
    got = download_file(asset.repo_id, filename, dest.parent / filename)
    if got is None:
        return None
    if filename.endswith(".index.json"):
        index = json.loads(got.read_text())
        shards = sorted(set(index.get("weight_map", {}).values()))
        for shard in shards:
            if download_file(asset.repo_id, shard, dest.parent / shard) is None:
                return None
    return got
