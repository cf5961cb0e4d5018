"""dsocr_tpu — TPU-native OCR vision-language inference framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the Rust
``deepseek-ocr.rs`` stack: four OCR VLM families (DeepSeek-OCR v1/v2,
PaddleOCR-VL, DotsOCR, GLM-OCR) behind a CLI and an OpenAI-compatible
server, with a TOML model registry, the DSQ quantized-weight container,
paged KV-cache decoding with on-device sampling, and mesh-sharded
(TP/EP/DP) execution over TPU ICI.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):

- ``core``     engine protocol, decode params, conversation templates,
               streaming deltas, sampling, bench timers
- ``config``   TOML app config, model registry, override layering, VFS
- ``assets``   HF/ModelScope asset manifests + downloader
- ``image``    Pillow-exact bicubic resampling, letterbox global view,
               dynamic crop tiling, smart_resize/patchify
- ``models``   per-family towers + decoders (deepseek, paddleocr, dots, glm)
- ``ops``      shared JAX ops + Pallas TPU kernels (attention, rmsnorm,
               rope, MoE routing, dequant-matmul)
- ``runtime``  paged KV cache, jitted decode loop, on-device sampling
- ``parallel`` mesh construction + sharding rules (TP/EP/DP)
- ``dsq``      DSQ container reader/writer/quantizers/adapters
- ``cli``      batch inference CLI
- ``server``   OpenAI-compatible HTTP server (aiohttp), SSE streaming
"""

__version__ = "0.1.0"
