"""Text-analysis pandas UDFs for training-data pipelines: heuristic
language ID, quality scoring, token counting, rolling-hash fingerprints.

All Arrow-batched (no per-row Spark UDFs).  Language ID is a deterministic
character-n-gram/stopword heuristic — no external models (sandbox has no
fasttext/langdetect), which also keeps it reproducible at scale.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StringType

# tiny per-language marker sets: common function words + characteristic
# character patterns; a deterministic vote, not a statistical model
_LANG_MARKERS: dict[str, tuple[set[str], str]] = {
    "en": ({"the", "and", "of", "to", "is", "in", "that", "it", "for", "with"}, r"th|ing\b|\bwh"),
    "de": ({"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"}, r"sch|ung\b|ß"),
    "es": ({"el", "la", "los", "las", "que", "de", "es", "en", "un", "una", "por"}, r"ción\b|ñ|\bll"),
    "fr": ({"le", "la", "les", "des", "est", "et", "une", "dans", "pour", "que"}, r"eau|aux\b|ç"),
    "el": (set(), r"[Ͱ-Ͽἀ-῿]"),
    "zh": (set(), r"[一-鿿]"),
    "ja": (set(), r"[぀-ヿ]"),
}
_TOKEN_RE = re.compile(r"\s+")


def lang_id_text(text: str) -> str:
    if not text or not text.strip():
        return "und"
    low = text.lower()
    tokens = set(_TOKEN_RE.split(low.strip()))
    best, best_score = "und", 0.0
    for lang, (stopwords, pattern) in _LANG_MARKERS.items():
        score = float(len(tokens & stopwords))
        score += 2.0 * len(re.findall(pattern, low))
        if score > best_score:
            best, best_score = lang, score
    return best


@pandas_udf(StringType())
def lang_id_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda t: "und" if t is None else lang_id_text(str(t)))


def quality_score_text(text: str) -> float:
    """[0, 1] heuristic: rewards word-like length distribution and
    alphanumeric density, penalizes extreme repetition — the
    length/punct/stopword-ratio family of web-corpus quality filters."""
    if not text:
        return 0.0
    n = len(text)
    tokens = [t for t in _TOKEN_RE.split(text.strip()) if t]
    if not tokens:
        return 0.0
    mean_tok = sum(len(t) for t in tokens) / len(tokens)
    len_score = max(0.0, 1.0 - abs(mean_tok - 5.0) / 10.0)
    alnum = sum(c.isalnum() or c.isspace() for c in text) / n
    uniq = len(set(tokens)) / len(tokens)
    return round(0.4 * len_score + 0.4 * alnum + 0.2 * uniq, 6)


@pandas_udf(DoubleType())
def quality_score_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda t: 0.0 if t is None else quality_score_text(str(t)))


_BPEISH = re.compile(r"\w+|[^\w\s]")


@pandas_udf(LongType())
def token_count_udf(s: pd.Series) -> pd.Series:
    """BPE-ish token proxy: word + punctuation pieces."""
    return s.map(lambda t: 0 if t is None else len(_BPEISH.findall(str(t)))).astype("int64")


def rolling_fingerprint_text(text: str, window: int = 16, keep: int = 4) -> list[int]:
    """Winnowing-style document fingerprint: polynomial rolling hash over
    byte windows, keep the `keep` smallest distinct hashes (deterministic,
    order-free document sketch)."""
    data = text.encode("utf-8")
    if len(data) < window:
        data = data + b"\x00" * (window - len(data))
    B, M = 257, (1 << 61) - 1
    h = 0
    pw = pow(B, window - 1, M)
    hashes = set()
    for i, byte in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * pw) % M
        h = (h * B + byte) % M
        if i >= window - 1:
            hashes.add(h)
    smallest = sorted(hashes)[:keep]
    return [np.uint64(x).astype(np.int64).item() for x in smallest]


def fingerprint_udf(window: int = 16, keep: int = 4):
    from pyspark.sql.types import ArrayType

    @pandas_udf(ArrayType(LongType()))
    def _fp(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: None if t is None else rolling_fingerprint_text(str(t), window, keep)
        )

    return _fp
