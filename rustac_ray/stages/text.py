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

__all__ = [
    "TextStats",
    "LangId",
    "Fingerprint",
    "Redactor",
    "NormalizeText",
    "add_token_counts",
    "repetition_stats",
    "chunk_documents",
]

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
        # vectorized stopword voting with the exact scalar semantics:
        # first 200 [a-zà-ÿ]+ tokens of the lowercased text, strict-">"
        # first-max over the language order, 'und' on zero votes
        langs = list(self.tables)
        toks = (
            batch["text"].astype(str).str.lower().str.findall(self.token_re)
        )
        ex = toks.explode()
        ex = ex[ex.notna()]
        pos_of = pd.Series(np.arange(len(batch), dtype=np.int64), index=batch.index)
        if len(ex):
            rows = pos_of[ex.index].to_numpy()
            # cap at the first 200 tokens per doc (rows arrive in order)
            within = np.ones(len(rows), bool)
            run = np.ones(len(rows), np.int64)
            starts = np.flatnonzero(np.diff(rows, prepend=rows[0] - 1))
            run = np.arange(len(rows)) - np.repeat(starts, np.diff(np.append(starts, len(rows))))
            within = run < 200
            rows = rows[within]
            words = ex.to_numpy()[within]
            votes = np.zeros((len(batch), len(langs)), np.int64)
            wser = pd.Series(words)
            for j, lang in enumerate(langs):
                hit = wser.isin(self.tables[lang]).to_numpy()
                votes[:, j] = np.bincount(rows[hit], minlength=len(batch))
        else:
            votes = np.zeros((len(batch), len(langs)), np.int64)
        best = np.argmax(votes, axis=1)  # first max wins, same as strict ">"
        pred = np.array(langs, dtype=object)[best]
        pred[votes.max(axis=1) == 0] = "und"
        batch["lang_pred"] = pred
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


class Redactor:
    """PII-style pattern redaction: replace every match of each configured
    regex with its placeholder and count the hits per doc.

    Patterns compile ONCE per actor (``__init__``); ``__call__`` is pandas
    ``str.replace``/``str.count`` — the C regex engine scans each doc, no
    Python per row. Patterns must stay within the RE2-compatible subset
    (no backrefs/lookahead) so the DuckDB ``regexp_replace(..., 'g')``
    oracle matches byte-for-byte. Default set: emails, US-style phone
    numbers, IPv4 addresses — the standard scrub list for web corpora.
    """

    DEFAULT_PATTERNS: list[tuple[str, str]] = [
        (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
        (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
        (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ]

    def __init__(self, patterns: list[tuple[str, str]] | None = None):
        import re

        self.patterns = [
            (re.compile(p), repl) for p, repl in (patterns or self.DEFAULT_PATTERNS)
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].astype(str)
        n_red = pd.Series(np.zeros(len(batch), np.int64), index=batch.index)
        for pat, repl in self.patterns:
            n_red += text.str.count(pat).astype("int64")
            text = text.str.replace(pat, repl, regex=True)
        batch["text"] = text
        batch["n_redactions"] = n_red
        return batch


class NormalizeText:
    """Unicode + whitespace canonicalization: NFC-normalize, collapse
    ASCII whitespace runs to one space, strip ends — the first cleaning
    pass of every web-text pipeline, and the step that makes exact dedup
    actually fire on visually-identical docs.

    The whitespace class is the EXPLICIT ``[ \\t\\n\\r\\f\\v]`` (Python's
    ``\\s`` is Unicode-wide, RE2/DuckDB's is ASCII — naming the class
    keeps both sides byte-identical); NFC comes from unicodedata, the
    same Unicode normalization DuckDB's nfc_normalize applies.
    """

    def __init__(self):
        import re

        self.ws = re.compile(r"[ \t\n\r\f\v]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import unicodedata

        orig = batch["text"].astype(str)
        norm = orig.map(lambda s: unicodedata.normalize("NFC", s))
        norm = norm.str.replace(self.ws, " ", regex=True).str.strip()
        batch["text"] = norm
        batch["changed"] = (norm != orig).to_numpy()
        return batch


def repetition_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style within-doc repetition signals, fully vectorized.

    Per doc: total whitespace tokens, distinct tokens, the most-frequent
    token's count, ``top_token_frac`` (most-frequent / total) and
    ``distinct_ratio`` (distinct / total). High ``top_token_frac`` or low
    ``distinct_ratio`` marks degenerate repeated-token documents —
    the standard pre-training quality filter signals (Gopher §A1.1).

    Docs in a batch are independent, so the explode + groupby runs on C
    kernels inside each ``map_batches`` task — no shuffle, no state.
    """
    toks = batch["text"].astype(str).str.split()
    ex = toks.explode().dropna()
    pos_of = pd.Series(np.arange(len(batch), dtype=np.int64), index=batch.index)
    rows = pos_of[ex.index].to_numpy()
    per = pd.DataFrame({"row": rows, "token": ex.to_numpy()})
    cnt = per.groupby(["row", "token"], sort=False).size().reset_index(name="c")
    by_row = cnt.groupby("row", sort=False)["c"]
    n_tokens = np.zeros(len(batch), np.int64)
    n_distinct = np.zeros(len(batch), np.int64)
    top_count = np.zeros(len(batch), np.int64)
    agg = pd.DataFrame({"sum": by_row.sum(), "n": by_row.size(), "max": by_row.max()})
    idx = agg.index.to_numpy().astype(np.int64)
    n_tokens[idx] = agg["sum"].to_numpy()
    n_distinct[idx] = agg["n"].to_numpy()
    top_count[idx] = agg["max"].to_numpy()
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy(),
            "n_tokens": n_tokens,
            "n_distinct": n_distinct,
            "top_count": top_count,
            "top_token_frac": top_count / np.maximum(n_tokens, 1),
            "distinct_ratio": n_distinct / np.maximum(n_tokens, 1),
        }
    )


def add_token_counts(batch: pd.DataFrame) -> pd.DataFrame:
    """Stateless variant: whitespace token count only (oracle-friendly)."""
    batch["n_tokens"] = (
        batch["text"].astype(str).str.split().str.len().fillna(0).astype("int64")
    )
    return batch


def chunk_documents(ds, *, window: int = 64, stride: int = 48,
                    col: str = "text", id_col: str = "doc_id"):
    """Fixed-token-window chunking with overlap — the context-window prep
    every LM training pipeline runs before packing: each document splits
    into chunks of ``window`` whitespace tokens advancing by ``stride``
    (chunk starts s = 0, stride, 2·stride, … while s < n_tokens; the
    tail chunk may be short). → (id_col, chunk_id, n_tokens, chunk_text).

    Shuffle-free flat expansion: the split is one vectorized pandas C
    call per batch; the per-chunk loop does only C-level list-slice +
    join work, so cost is proportional to OUTPUT characters (the
    unavoidable lower bound for materialized chunk text), never corpus
    row count² and never the driver. Tokenization is the engine-wide
    single-space convention, so the SQL twin is DuckDB
    ``list_slice(string_split(text,' '), …)`` verbatim.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")

    def chunk(batch: pd.DataFrame) -> pd.DataFrame:
        toks_col = batch[col].astype(str).str.split(" ")
        ids = batch[id_col].to_numpy()
        out_id, out_cid, out_nt, out_txt = [], [], [], []
        for did, toks in zip(ids, toks_col.to_numpy()):
            n = len(toks)
            if n == 0:
                continue
            for cid, s in enumerate(range(0, n, stride)):
                seg = toks[s:s + window]
                out_id.append(did)
                out_cid.append(cid)
                out_nt.append(len(seg))
                out_txt.append(" ".join(seg))
        return pd.DataFrame(
            {
                id_col: np.array(out_id, dtype=ids.dtype),
                "chunk_id": np.array(out_cid, dtype=np.int64),
                "n_tokens": np.array(out_nt, dtype=np.int64),
                "chunk_text": out_txt,
            }
        )

    return ds.map_batches(chunk, batch_format="pandas")
