"""Web-text functions: HTML text extraction, href extraction, text analysis.

North-rule front end (BASELINE.json input_hint): pages table
(url, warc_ts, html binary, text, lang); extracted text must be
byte-identical per url across runs.  All functions are Arrow-batched pandas
UDFs (no per-row Python UDFs) built on pandas vectorized string ops where
possible.

Text analysis ops (training-data pipeline): language-ID (stopword n-gram
heuristic), quality scoring, token counting, rolling-hash fingerprinting.
"""

from __future__ import annotations

import html as _html
import re
from urllib.parse import urljoin

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

_TAG_DROP_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(
    rb"""<a\s[^>]*?href\s*=\s*["']([^"'#>]+)["']""", re.IGNORECASE)


def extract_text_bytes(html_bytes: bytes) -> str:
    """Deterministic HTML -> text: drop script/style, strip tags, decode
    entities, canonicalize whitespace.  Pure function of the input bytes
    (same bytes in => same string out), which is the byte-identity invariant."""
    if html_bytes is None:
        return ""
    stripped = _TAG_DROP_RE.sub(b" ", html_bytes)
    stripped = _TAG_RE.sub(b" ", stripped)
    decoded = stripped.decode("utf-8", errors="replace")
    decoded = _html.unescape(decoded)
    return _WS_RE.sub(" ", decoded).strip()


def extract_text_udf(html_col):
    """Arrow-batched text extraction; lazy UDF construction (no session
    needed at import)."""
    @F.pandas_udf("string")
    def _udf(html: pd.Series) -> pd.Series:
        return html.map(extract_text_bytes)
    return _udf(html_col)


def extract_hrefs_bytes(html_bytes: bytes, base_url: str) -> list[str]:
    """<a href> targets resolved against the base url, document order."""
    if html_bytes is None:
        return []
    out = []
    for m in _HREF_RE.finditer(html_bytes):
        target = m.group(1).decode("utf-8", errors="replace").strip()
        if target:
            out.append(urljoin(base_url, target))
    return out


def extract_hrefs_udf(html_col, url_col):
    @F.pandas_udf("array<string>")
    def _udf(html: pd.Series, url: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_hrefs_bytes(h, u) for h, u in zip(html, url)])
    return _udf(html_col, url_col)


# ---------------------------------------------------------------- analysis

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "dans"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
}

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+(?:'[a-z]+)?|[^\sA-Za-z0-9]")


def lang_id_udf(text_col):
    """Heuristic language ID: argmax stopword hit count, ties/unknown -> 'und'."""
    def one(t: str) -> str:
        if not t:
            return "und"
        words = set(t.lower().split())
        best, best_n = "und", 0
        for lang in sorted(_STOPWORDS):
            n = sum(1 for w in _STOPWORDS[lang] if w in words)
            if n > best_n:
                best, best_n = lang, n
        return best

    @F.pandas_udf("string")
    def _udf(text: pd.Series) -> pd.Series:
        return text.map(one)
    return _udf(text_col)


def token_count_udf(text_col):
    """BPE-ish token counting: alphanumeric runs + individual punctuation."""
    @F.pandas_udf("long")
    def _udf(text: pd.Series) -> pd.Series:
        return text.map(lambda t: len(_TOKEN_RE.findall(t)) if t else 0)
    return _udf(text_col)


def quality_score_cols(text_col: str = "text"):
    """Column expressions for document quality signals — pure Spark SQL
    (JVM-side, codegen'd): length, words, mean word length, punctuation and
    uppercase ratios, and a composite [0,1] quality score."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(t, r"\s+")
    n_words = F.size(words)
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    mean_wl = (n_chars - n_words + 1) / F.greatest(n_words, F.lit(1))
    score = (
        F.when(n_words < 5, 0.0)
        .otherwise(
            1.0
            - F.least(F.lit(1.0), punct / F.greatest(n_chars, F.lit(1)) * 4.0)
            * F.lit(0.5)
            - F.least(F.lit(1.0), F.abs(mean_wl - 5.0) / 10.0) * F.lit(0.5))
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "punct_chars": punct.cast("long"),
        "upper_chars": upper.cast("long"),
        "quality": F.round(score, 6),
    }


def fingerprint_udf(text_col):
    """Rolling polynomial document fingerprint (deterministic 63-bit):
    chunked Horner hash mod 2^61-1, P=1315423911."""
    MOD = np.uint64((1 << 61) - 1)
    P = np.uint64(1315423911)

    def one(t: str) -> int:
        if not t:
            return 0
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for chunk_start in range(0, len(b), 4096):
                chunk = b[chunk_start:chunk_start + 4096]
                # horner over the chunk, then fold
                acc = np.uint64(0)
                for x in chunk:
                    acc = (acc * P + x) % MOD
                h = (h * P + acc) % MOD
        return int(h)

    @F.pandas_udf("long")
    def _udf(text: pd.Series) -> pd.Series:
        return text.map(one)
    return _udf(text_col)
