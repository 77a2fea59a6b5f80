"""Text-analysis stages for the documents table (training-data pipeline ops).

All are stateful actor-pool stages (regexes/tables compiled once per actor
in ``__init__``) operating on pandas batches with vectorized ``.str`` ops —
no per-row Python in the hot path beyond what pandas vectorizes.

Ops: token counting (whitespace + BPE-ish word/punct regex), language-ID
(stopword n-gram heuristic), quality scoring (length / punctuation /
stopword ratios), document fingerprinting (rolling polynomial hash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["TextStats", "LangId", "Fingerprint", "add_token_counts"]

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that", "was", "for"},
    "de": {"der", "die", "und", "das", "ist", "ich", "nicht", "mit", "ein", "auf"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "es"},
}


class TextStats:
    """n_tokens (whitespace), n_words (BPE-ish regex), punct/upper ratios,
    quality score. Deterministic, SQL-mirrorable arithmetic."""

    def __init__(self):
        import re

        self.word_re = re.compile(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]")
        self.punct_re = re.compile(r"[^\w\s]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].astype(str)
        n_chars = text.str.len().astype("int64")
        batch["n_tokens"] = text.str.split().str.len().fillna(0).astype("int64")
        batch["n_words"] = text.str.count(r"[A-Za-z0-9]+").astype("int64")
        batch["n_punct"] = text.str.count(r"[^\w\s]").astype("int64")
        batch["punct_ratio"] = batch["n_punct"] / n_chars.clip(lower=1)
        # quality: long-enough docs with moderate punctuation score higher
        batch["quality"] = (
            np.minimum(n_chars, 500) / 500.0 * (1.0 - np.minimum(batch["punct_ratio"] * 4.0, 1.0))
        )
        return batch


class LangId:
    """Stopword-voting language ID over the 4 built-in languages; 'und' when
    no stopword hits. A deterministic n-gram heuristic (no model files)."""

    def __init__(self):
        import re

        self.token_re = re.compile(r"[a-zà-ÿ]+")
        self.tables = {lang: frozenset(words) for lang, words in _STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def detect(text: str) -> str:
            toks = self.token_re.findall(text.lower())[:200]
            if not toks:
                return "und"
            best, best_n = "und", 0
            for lang, table in self.tables.items():
                n = sum(t in table for t in toks)
                if n > best_n:
                    best, best_n = lang, n
            return best

        batch["lang_pred"] = batch["text"].astype(str).map(detect)
        return batch


class Fingerprint:
    """64-bit rolling polynomial hash of the normalized text (document
    fingerprint for exact-dup detection; stable across runs)."""

    BASE = np.uint64(1099511628211)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        base = Fingerprint.BASE

        def fp(text: str) -> np.int64:
            data = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
            if len(data) == 0:
                return np.int64(0)
            # polynomial rolling hash sum(b_i * BASE^(n-1-i)) with natural
            # uint64 wraparound — one vectorized pass per doc
            with np.errstate(over="ignore"):
                powers = np.multiply.accumulate(
                    np.full(len(data), base, dtype=np.uint64)
                )
                h = np.sum(data.astype(np.uint64) * powers[::-1], dtype=np.uint64)
            return np.int64(h.astype(np.int64))

        batch["fingerprint"] = batch["text"].astype(str).map(fp)
        return batch


def add_token_counts(batch: pd.DataFrame) -> pd.DataFrame:
    """Stateless variant: whitespace token count only (oracle-friendly)."""
    batch["n_tokens"] = (
        batch["text"].astype(str).str.split().str.len().fillna(0).astype("int64")
    )
    return batch
