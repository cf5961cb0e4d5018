"""Server entry: config → state → aiohttp app (ref server/src/app.rs)."""

from __future__ import annotations

import argparse
import pathlib

from aiohttp import web

from ..config import AppConfig, VirtualFileSystem
from ..config.args import add_common_model_args, add_server_bind_args
from .routes import build_app
from .state import AppState


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="dsocr-server")
    add_common_model_args(parser)
    add_server_bind_args(parser)
    parser.add_argument("--device", default=None, help="tpu | cpu")
    parser.add_argument("--max-seq-len", type=int, default=8192)
    args = parser.parse_args(argv)

    from ..utils.logging import init_logging
    init_logging()

    config = (
        AppConfig.load_or_init(pathlib.Path(args.config))
        if args.config
        else AppConfig.load_or_init(VirtualFileSystem().config_file())
    )
    if args.model:
        config.models.active = args.model
    host = args.host or config.server.host
    port = args.port or config.server.port

    from ..core.runtime_device import apply_device_selection

    apply_device_selection(args.device or config.inference.device)

    state = AppState(
        config, mesh=args.mesh, kv_quant=getattr(args, "kv_quant", None),
        prefix_cache=getattr(args, "prefix_cache", None),
    )
    app = build_app(state)
    web.run_app(app, host=host, port=port)
    return 0


if __name__ == "__main__":
    main()
