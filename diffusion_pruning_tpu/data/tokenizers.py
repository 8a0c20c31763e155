"""Tokenizer builders with the CI fallback the CLIs share.

Real runs load HF tokenizers from local checkpoint dirs (the reference does
the same via from_pretrained — scripts/aptp/prune.py upstream); when the
dirs are absent every CLI falls back to the deterministic hash tokenizer so
the full control flow — including the real on-disk dataset path — stays
executable end-to-end without downloaded checkpoints (smoke/CI/replay).
"""
from __future__ import annotations

import os
import sys

from .dummy_tokenizer import DummyTokenizer


def build_clip_tokenizer(sd_root, max_length: int = 77, vocab_size: int = 128):
    """CLIPTokenizer from `{sd_root}/tokenizer`, or the hash fallback."""
    path = os.path.join(sd_root or "", "tokenizer")
    if os.path.exists(path):
        from transformers import CLIPTokenizer
        return CLIPTokenizer.from_pretrained(path)
    print(f"[smoke] CLIP tokenizer {path!r} missing — dummy hash tokenizer",
          file=sys.stderr)
    return DummyTokenizer(vocab_size=vocab_size, max_length=max_length)


def build_mpnet_tokenizer(root, vocab_size: int, max_length: int = 128):
    """AutoTokenizer from the MPNet dir, or the hash fallback sized to the
    model's vocab."""
    if root and os.path.exists(root):
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(root)
    print(f"[smoke] MPNet tokenizer {root!r} missing — dummy hash tokenizer",
          file=sys.stderr)
    return DummyTokenizer(vocab_size=vocab_size, max_length=max_length)
