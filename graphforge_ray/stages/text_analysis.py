"""Text-analysis stages for large-scale training-data pipelines.

All operate on a documents table ``(doc_id, text, lang, ...)`` as
vectorized ``map_batches`` bodies (pandas str kernels / numpy) or an actor
pool where state is worth amortizing (compiled regexes, stopword tables —
loaded once per actor in ``__init__``).

Components: token counting (whitespace + BPE-ish word/punct regex),
quality scoring (length/punct/digit/upper/stopword ratios), n-gram
language ID heuristic, rolling-hash document fingerprinting.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

__all__ = [
    "token_stats_batch", "TextQualityScorer", "LangIdentifier",
    "fingerprint_batch", "content_hash_batch", "pii_scrub_batch",
    "normalize_text_batch",
    "chunk_documents",
    "gopher_rules_batch", "GOPHER_STOPWORDS",
    "compression_ratio_batch",
]

_WS_TOKEN = re.compile(r"\S+")
# BPE-ish pre-tokenizer: words / numbers / punctuation runs (GPT-2-style
# coarse approximation, public knowledge)
_BPE_TOKEN = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


def token_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized token counting: ``n_tokens`` (whitespace tokens) and
    ``n_bpe_tokens`` (word/number/punct pieces)."""
    text = df["text"].fillna("")
    out = df.copy()
    out["n_tokens"] = text.str.count(_WS_TOKEN).astype("int64")
    out["n_bpe_tokens"] = text.str.count(_BPE_TOKEN).astype("int64")
    return out


class TextQualityScorer:
    """Actor-pool stage: per-document quality signals. Regexes compiled and
    stopword table built ONCE per actor (``__init__``), reused per batch.

    Counts are integers (stable under any float comparison); ratios are
    derived and rounded to 6 decimals.
    """

    STOPWORDS = {
        "the", "and", "of", "a", "an", "to", "in", "is", "it", "that",
        "for", "on", "as", "with", "was", "are", "be", "this", "at", "by",
    }

    def __init__(self) -> None:
        self.punct = re.compile(r"[^\w\s]")
        self.digit = re.compile(r"\d")
        self.upper = re.compile(r"[A-Z]")
        self.word = re.compile(r"[a-z']+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        out = df.copy()
        n_chars = text.str.len().astype("int64")
        out["n_chars_text"] = n_chars
        out["n_punct"] = text.str.count(self.punct).astype("int64")
        out["n_digits"] = text.str.count(self.digit).astype("int64")
        out["n_upper"] = text.str.count(self.upper).astype("int64")
        denom = n_chars.clip(lower=1)
        out["punct_ratio"] = (out["n_punct"] / denom).round(6)
        out["digit_ratio"] = (out["n_digits"] / denom).round(6)

        lower_words = text.str.lower().str.findall(self.word)
        n_words = lower_words.str.len().astype("int64")
        n_stop = lower_words.map(
            lambda ws: sum(1 for w in ws if w in self.STOPWORDS)
        ).astype("int64")
        out["n_words"] = n_words
        out["n_stopwords"] = n_stop
        out["stopword_ratio"] = (n_stop / n_words.clip(lower=1)).round(6)
        # simple composite quality: long enough, not punct/digit heavy,
        # has stopwords (prose-ness)
        out["quality_score"] = (
            (n_chars.clip(upper=2000) / 2000) * 0.4
            + (1 - (out["punct_ratio"] * 4).clip(upper=1)) * 0.2
            + (1 - (out["digit_ratio"] * 4).clip(upper=1)) * 0.2
            + (out["stopword_ratio"] * 4).clip(upper=1) * 0.2
        ).round(6)
        return out


class LangIdentifier:
    """Actor-pool stage: n-gram + stopword language-ID heuristic for
    {en, de, fr, es}. Deterministic; tables built once per actor."""

    PROFILES = {
        "en": {"the", "and", "of", "to", "in", "is", "you", "that", "it",
               "for", "with", "was", "this", "are", "not"},
        "de": {"der", "die", "und", "das", "ist", "ich", "nicht", "mit",
               "ein", "eine", "zu", "den", "von", "für", "auf"},
        "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est",
               "dans", "que", "qui", "pour", "pas", "avec"},
        "es": {"el", "la", "los", "las", "y", "de", "que", "un", "una",
               "es", "en", "no", "por", "con", "para"},
    }
    NGRAMS = {
        "en": {"th", "he", "in", "er", "an"},
        "de": {"en", "er", "ch", "de", "ei"},
        "fr": {"es", "le", "de", "en", "re"},
        "es": {"de", "en", "el", "la", "os"},
    }

    def __init__(self) -> None:
        self.word = re.compile(r"[a-zà-ÿ']+")

    def identify(self, text: str) -> str:
        words = self.word.findall(text.lower())
        if not words:
            return "und"
        scores: dict[str, float] = {}
        bigrams: dict[str, int] = {}
        joined = " ".join(words)
        for i in range(len(joined) - 1):
            bg = joined[i : i + 2]
            bigrams[bg] = bigrams.get(bg, 0) + 1
        for lang in self.PROFILES:
            sw = sum(1 for w in words if w in self.PROFILES[lang])
            ng = sum(bigrams.get(g, 0) for g in self.NGRAMS[lang])
            scores[lang] = sw * 3.0 + ng * 0.1
        # deterministic tie-break by language code
        return max(scores, key=lambda k: (scores[k], k))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["lang_pred"] = df["text"].fillna("").map(self.identify)
        return out


_MOD = (1 << 61) - 1
_BASE = 257


def _rolling_fingerprint(text: str, window: int = 16, keep: int = 4) -> str:
    """Winnowing-style fingerprint: min-k of rolling hashes over character
    windows (deterministic, order-free document signature)."""
    if not text:
        return ""
    data = text.encode("utf-8", errors="replace")
    if len(data) <= window:
        return hashlib.blake2b(data, digest_size=8).hexdigest()
    h = 0
    power = pow(_BASE, window - 1, _MOD)
    mins: list[int] = []
    for i, b in enumerate(data):
        h = (h * _BASE + b) % _MOD
        if i >= window:
            h = (h - data[i - window] * power * _BASE) % _MOD
        if i >= window - 1:
            mins.append(h)
    mins = sorted(set(mins))[:keep]
    return "-".join(f"{m:016x}" for m in mins)


# PII scrub patterns, chosen to evaluate identically under Python re
# and DuckDB/RE2 (oracle parity): no lookarounds, \b is common to both.
# re.ASCII is REQUIRED for that parity — Python's \d and \b are
# Unicode-aware by default (Arabic-Indic '١٢٣٤' counts as \d{4}) while
# RE2's are ASCII-only, so without the flag the counts diverge from
# the SQL oracle on non-ASCII digits. Applied IN ORDER, each count
# taken on the text as redacted so far.
_PII_PATTERNS = (
    ("emails",
     re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                re.ASCII),
     "<EMAIL>"),
    ("ips",
     re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", re.ASCII),
     "<IP>"),
    ("phones", re.compile(r"\b555-\d{4}\b", re.ASCII), "<PHONE>"),
)


def pii_scrub_batch(
    df: pd.DataFrame, text_col: str = "text"
) -> pd.DataFrame:
    """PII redaction for training corpora (the public CCNet/RedPajama
    scrub step): emails, IPv4 addresses and NANP-555 phone numbers are
    counted then replaced with typed placeholders, sequentially, all
    via vectorized pandas regex kernels (patterns compiled once per
    process at import). Adds ``n_emails``/``n_ips``/``n_phones``
    (int64), rewrites ``text_col`` in place and adds
    ``redacted_chars`` = len(redacted text)."""
    out = df.copy()
    t = df[text_col].fillna("")
    for name, pat, repl in _PII_PATTERNS:
        out[f"n_{name}"] = t.str.count(pat).astype("int64")
        t = t.str.replace(pat, repl, regex=True)
    out[text_col] = t
    out["redacted_chars"] = t.str.len().astype("int64")
    return out


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out["fingerprint"] = df["text"].fillna("").map(_rolling_fingerprint)
    return out


def content_hash_batch(df: pd.DataFrame, column: str = "text") -> pd.DataFrame:
    """md5 content hash (matches SQL ``md5(text)`` for oracle parity).
    Vectorized via the DuckDB md5 kernel (fasthash); hashlib fallback."""
    out = df.copy()
    try:
        out["content_hash"] = _md5_hex_duckdb_plain(df[column])
    except Exception:
        out["content_hash"] = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in df[column]
        ]
    return out


def _md5_hex_duckdb_plain(texts: pd.Series):
    """md5(text) over one Arrow column — no salt (SQL: md5(text))."""
    import pyarrow as pa

    from .fasthash import _duck_con

    con = _duck_con()
    tbl = pa.table({"t": pa.array(texts.fillna("").astype(str))})
    con.register("_fasthash_txt", tbl)
    try:
        return con.execute(
            "SELECT md5(t) AS h FROM _fasthash_txt"
        ).fetchnumpy()["h"]
    finally:
        con.unregister("_fasthash_txt")


# unicode whitespace squeezed to one ASCII space — the class is pinned
# EXPLICITLY (not \s) because Python's \s is unicode-wide while RE2's
# (DuckDB's) is ASCII-only; the SQL oracle uses the identical class via
# \x{...} escapes (parity pinned in tests)
_NORM_CTRL = re.compile(r"[\x00-\x1F\x7F]")
_NORM_WS = re.compile(
    "[ \t\n\r\f\v\u00a0\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]+"
)


def normalize_text_batch(
    df: pd.DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> pd.DataFrame:
    """C4-style text cleanup, SQL-replayable: NFC unicode
    normalization, control characters → space, unicode whitespace runs
    squeezed to one ASCII space, ends trimmed. Adds ``out_col``;
    null-safe (null → null). Vectorized via pandas str kernels (NFC
    through Series.str.normalize — pandas' C-accelerated path)."""
    t = df[text_col].astype("string")
    t = t.str.normalize("NFC")
    t = t.str.replace(_NORM_CTRL, " ", regex=True)
    t = t.str.replace(_NORM_WS, " ", regex=True)
    t = t.str.strip(" ")
    out = df.copy()
    out[out_col] = t.astype(object)
    return out


# The eight "must contain >= 2 of" stopwords from the Gopher /
# MassiveText quality filter (Rae et al. 2021, arXiv:2112.11446 §A1.1).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_GOPHER_ALPHA_WORD = re.compile(r"(?<!\S)(?=\S*[A-Za-z])\S+")
_GOPHER_BULLET = re.compile(r"(?m)^[ \t]*[-*•]")
_GOPHER_ELLIPSIS_EOL = re.compile(r"(?m)\.\.\.[ \t]*$")
_GOPHER_ELLIPSIS = re.compile(r"\.\.\.")


def gopher_rules_batch(
    df: pd.DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> pd.DataFrame:
    """The published Gopher/MassiveText document-quality rules
    (Rae et al. 2021 §A1.1), one boolean column per rule plus the
    conjunction ``gopher_pass``. Deliberately INTEGER-EXACT: every
    ratio threshold is evaluated as a cross-multiplied integer
    comparison (e.g. alpha-word fraction ≥ 0.8 ⇔ 5·alpha ≥ 4·words),
    so an SQL oracle replays each rule with no float-rounding seam.

    Rules: word count in [min_words, max_words]; mean word length in
    [3, 10] (⇔ 3·words ≤ word_chars ≤ 10·words); symbol-to-word ratio
    (# or …) ≤ 0.1; ≥ 80 % of words contain an alphabetic character;
    ≥ 2 distinct Gopher stopwords present; ≤ 90 % of lines start with
    a bullet; ≤ 30 % of lines end with an ellipsis. Pure map-side,
    fully vectorized pandas str kernels."""
    text = df[text_col].fillna("")
    n_words = text.str.count(_WS_TOKEN).astype("int64")
    word_chars = text.str.replace(r"\s", "", regex=True).str.len().astype(
        "int64"
    )
    alpha_words = text.str.count(_GOPHER_ALPHA_WORD).astype("int64")
    symbols = (
        text.str.count("#") + text.str.count(_GOPHER_ELLIPSIS)
    ).astype("int64")
    n_lines = (text.str.count("\n") + 1).astype("int64")
    bullet_lines = text.str.count(_GOPHER_BULLET).astype("int64")
    ellipsis_lines = text.str.count(_GOPHER_ELLIPSIS_EOL).astype("int64")
    n_stop = sum(
        text.str.contains(rf"\b{w}\b", regex=True).astype("int64")
        for w in GOPHER_STOPWORDS
    )

    out = df.copy()
    out["n_words"] = n_words
    out["r_words"] = (n_words >= min_words) & (n_words <= max_words)
    out["r_mean_len"] = (3 * n_words <= word_chars) & (
        word_chars <= 10 * n_words
    )
    out["r_symbol"] = 10 * symbols <= n_words
    out["r_alpha"] = 5 * alpha_words >= 4 * n_words
    out["r_stop"] = n_stop >= 2
    out["r_bullet"] = 10 * bullet_lines <= 9 * n_lines
    out["r_ellipsis"] = 10 * ellipsis_lines <= 3 * n_lines
    out["gopher_pass"] = (
        out["r_words"]
        & out["r_mean_len"]
        & out["r_symbol"]
        & out["r_alpha"]
        & out["r_stop"]
        & out["r_bullet"]
        & out["r_ellipsis"]
    )
    return out


def chunk_documents(
    docs: "ray.data.Dataset",
    size: int = 128,
    stride: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Sliding-window token chunking (the RAG / embedding-pipeline
    preprocessing step): each document becomes overlapping chunks of
    ``size`` whitespace tokens every ``stride`` tokens, windows starting
    at 0, stride, 2·stride, … while the start is inside the document.
    → (id, chunk_id:int64, chunk_text, n_tokens:int64). Pure map-side;
    empty/null docs emit nothing.

    SQL-replayable: the token array is ``regexp_extract_all('\\S+')``
    and each chunk is ``array_to_string(tokens[start+1 : start+size],
    ' ')`` — chunk text rejoins with SINGLE spaces (original whitespace
    is not preserved; documented contract)."""
    if size < 1 or stride < 1:
        raise ValueError(f"size/stride must be ≥ 1: {size}/{stride}")

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.findall(r"\S+")
        ids, cids, texts, ns = [], [], [], []
        for i, tl in zip(df[id_col], toks):
            n = len(tl)
            cid = 0
            for start in range(0, n, stride):
                w = tl[start:start + size]
                ids.append(i)
                cids.append(cid)
                texts.append(" ".join(w))
                ns.append(len(w))
                cid += 1
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype=df[id_col].dtype),
                "chunk_id": pd.Series(cids, dtype=np.int64),
                "chunk_text": pd.Series(texts, dtype=object),
                "n_tokens": pd.Series(ns, dtype=np.int64),
            }
        )

    return docs.map_batches(chunk, batch_format="pandas")


def compression_ratio_batch(
    df: pd.DataFrame,
    text_col: str = "text",
    level: int = 6,
) -> pd.DataFrame:
    """Compression-ratio quality signal: ``zlib_ratio`` = deflated size
    / raw utf-8 size (level-``level`` zlib, 6 dp). Web pipelines use it
    to catch boilerplate/template mass and degenerate repetition that
    word-level filters miss (highly compressible ⇒ ratio → 0) and
    binary-ish junk (ratio ≥ ~1). Adds ``raw_bytes``, ``zip_bytes``
    (int64) and ``zlib_ratio`` (float64; empty/null text → ratio 1.0 by
    convention so it never flags as degenerate).

    Deterministic: zlib output for a fixed (input, level) is stable
    across platforms for the reference zlib, and the RATIO contract is
    pinned by pytest goldens (no SQL oracle — deflate is not
    SQL-expressible). Per-row zlib.compress is one C call per document
    (the loop is not the hot path; deflate itself is)."""
    import zlib

    raw = df[text_col].fillna("").str.encode("utf-8")
    raw_n = raw.str.len().astype("int64")
    zip_n = np.fromiter(
        (len(zlib.compress(b, level)) for b in raw),
        dtype=np.int64,
        count=len(raw),
    )
    out = df.copy()
    out["raw_bytes"] = raw_n
    out["zip_bytes"] = zip_n
    ratio = np.where(raw_n > 0, zip_n / raw_n.replace(0, 1), 1.0)
    out["zlib_ratio"] = np.round(ratio, 6)
    return out
