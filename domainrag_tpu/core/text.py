"""Tokenization for the Flux text encoders.

Tokenizers are host-side (pure Python — SURVEY.md B8 allows this; they are
not kernels). Two providers:

- :func:`load_hf_tokenizers` — the real CLIP + T5 tokenizers from a local
  FLUX.1-dev checkpoint directory (``tokenizer`` / ``tokenizer_2``
  subfolders, as in batch_generate_flux_kshot.py:128-137);
- :class:`StubTokenizer` — a deterministic hash tokenizer for tests and
  random-weight runs where no vocab files exist (zero-egress environment).

Flux conventions: CLIP-L padded/truncated to 77 with EOS pooling; T5 padded
to ``max_sequence_length`` 512 (the reference uses diffusers defaults).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Protocol, Sequence

import numpy as np


class TokenizerLike(Protocol):
    def __call__(self, text: str, max_len: int) -> np.ndarray: ...


@dataclasses.dataclass
class StubTokenizer:
    """Deterministic word-hash tokenizer. bos/eos/pad ids mimic CLIP-style
    specials so EOS pooling paths are exercised."""

    vocab_size: int = 1000
    bos_id: Optional[int] = 998
    eos_id: int = 999
    pad_id: int = 0

    def __call__(self, text: str, max_len: int) -> np.ndarray:
        ids: List[int] = []
        if self.bos_id is not None:
            ids.append(self.bos_id)
        for word in text.lower().split():
            h = abs(hash(word)) % (self.vocab_size - 3) + 1
            ids.append(h)
        ids.append(self.eos_id)
        ids = ids[:max_len]
        ids += [self.pad_id] * (max_len - len(ids))
        return np.asarray(ids, np.int32)


@dataclasses.dataclass
class HFTokenizer:
    tokenizer: object

    def __call__(self, text: str, max_len: int) -> np.ndarray:
        out = self.tokenizer(text, padding="max_length", max_length=max_len,
                             truncation=True, return_tensors="np")
        return out["input_ids"][0].astype(np.int32)


def load_hf_tokenizers(flux_dev_path: str):
    """(clip_tokenizer, t5_tokenizer) from a local FLUX.1-dev dir."""
    from transformers import CLIPTokenizer, T5TokenizerFast
    clip_tok = CLIPTokenizer.from_pretrained(flux_dev_path,
                                             subfolder="tokenizer")
    t5_tok = T5TokenizerFast.from_pretrained(flux_dev_path,
                                             subfolder="tokenizer_2")
    return HFTokenizer(clip_tok), HFTokenizer(t5_tok)


def batch_tokenize(tok: TokenizerLike, prompts: Sequence[str],
                   max_len: int) -> np.ndarray:
    return np.stack([tok(p, max_len) for p in prompts])
