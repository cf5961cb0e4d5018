"""OpenAI-compatible HTTP server (ref crates/server): /v1/health,
/v1/models, /v1/responses, /v1/chat/completions with SSE streaming,
single-turn compaction, CORS, 50 MB limits."""
