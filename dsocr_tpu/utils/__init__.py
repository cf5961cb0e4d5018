"""Shared utilities: tokenizer adapter, safetensors IO helpers."""

from .tokenizer import TokenizerAdapter, load_tokenizer

__all__ = ["TokenizerAdapter", "load_tokenizer"]
