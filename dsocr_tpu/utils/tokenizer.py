"""Uniform tokenizer interface over HF `tokenizers.Tokenizer` (the
reference uses the same Rust library via the tokenizers crate) and
transformers tokenizers."""

from __future__ import annotations

import pathlib
from typing import List, Optional, Sequence


class TokenizerAdapter:
    def __init__(self, inner):
        self.inner = inner

    def encode(self, text: str) -> List[int]:
        """Encode without special tokens (matches the reference's
        `tokenizer.encode(segment, false)`)."""
        inner = self.inner
        if hasattr(inner, "encode") and hasattr(inner, "token_to_id"):
            # tokenizers.Tokenizer
            return list(inner.encode(text, add_special_tokens=False).ids)
        # transformers tokenizer
        return list(inner.encode(text, add_special_tokens=False))

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self.inner.decode(list(ids), skip_special_tokens=skip_special_tokens)

    def token_to_id(self, token: str) -> Optional[int]:
        inner = self.inner
        if hasattr(inner, "token_to_id"):
            out = inner.token_to_id(token)
            return int(out) if out is not None else None
        out = inner.convert_tokens_to_ids(token)
        unk = getattr(inner, "unk_token_id", None)
        if out is None or (unk is not None and out == unk):
            return None
        return int(out)


def load_tokenizer(path: pathlib.Path) -> TokenizerAdapter:
    """Load a tokenizer.json with the HF tokenizers runtime."""
    from tokenizers import Tokenizer

    return TokenizerAdapter(Tokenizer.from_file(str(path)))
