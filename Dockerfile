# dsocr_tpu serving image (TPU-native analogue of the reference's
# Dockerfile, which builds the Rust CLI/server binaries on a CUDA base:
# reference Dockerfile:1-25). Here the "build" step is the pip install
# plus an ahead-of-time compile of the native host kernels (Pillow-exact
# resampler, ggml quantizers) so the runtime image never needs to invoke
# g++ at request time.
#
# Run on a Cloud TPU VM (v5e/v6e) with the TPU runtime exposed:
#   docker build -t dsocr-tpu .
#   docker run --privileged --net=host \
#     -v $HOME/.cache/dsocr:/root/.cache/dsocr \
#     dsocr-tpu --host 0.0.0.0 --port 8000
#
# The entrypoint is the OpenAI-compatible server; override with
# `--entrypoint dsocr` for one-shot CLI inference.

FROM python:3.12-slim-bookworm AS build

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ && rm -rf /var/lib/apt/lists/*

WORKDIR /src
COPY pyproject.toml README.md ./
COPY native ./native
COPY dsocr_tpu ./dsocr_tpu

# libtpu wheel comes from Google's release repo; jax[tpu] falls back to
# CPU when no TPU is attached (dev/test images).
RUN pip install --no-cache-dir \
        --find-links https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        "jax[tpu]" && \
    pip install --no-cache-dir .

# ahead-of-time compile of the ctypes host kernels into the wheel cache
RUN python - <<'EOF'
from dsocr_tpu.native import native_available, quant_native_available
assert native_available(), "resample.cpp failed to build"
assert quant_native_available(), "quant.cpp failed to build"
EOF

FROM python:3.12-slim-bookworm
# the lazily-built native libs land under the user cache; copy both the
# site-packages and the prebuilt shared objects
COPY --from=build /usr/local/lib/python3.12/site-packages /usr/local/lib/python3.12/site-packages
COPY --from=build /usr/local/bin/dsocr* /usr/local/bin/
COPY --from=build /root/.cache/dsocr_tpu /root/.cache/dsocr_tpu

# persistent XLA compilation cache across container restarts (first
# compile of the serving graphs is minutes; warm starts are seconds)
ENV JAX_COMPILATION_CACHE_DIR=/root/.cache/dsocr/jax_comp_cache

ENTRYPOINT ["dsocr-server"]
