"""Text normalization as an Arrow-batched pandas UDF (SURVEY.md §2.3 S1).

Byte-identical to the reference's ``preprocess_text``
(/root/reference/app/minhash_clustering/preprocess_helper.py:8-36) for
every option combination — required by the per-row invariant in
BASELINE.json ``input_hint``.

Spark built-ins (`lower`, `regexp_replace`, `trim`) could cover 3 of the 5
steps, but Java and Python regex/Unicode semantics differ subtly (``\\w``
classes, NFD/Mn stripping), so for parity the whole chain runs inside ONE
pandas UDF using pandas' vectorized string methods (C-level loops over the
Arrow batch; no per-row Spark UDF).
"""

from __future__ import annotations

import functools
import re
import sys
import unicodedata

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Same compiled patterns as the reference; pandas .str.replace(regex=True)
# delegates to Python `re`, so semantics (unicode \w, \s) match exactly.
_CLEAN_PATTERN = re.compile(r"[^\w\s]")
_WS_PATTERN = re.compile(r"\s+")


@functools.lru_cache(maxsize=1)
def _mn_delete_table() -> dict[int, None]:
    """str.translate table deleting every codepoint of Unicode category Mn
    (nonspacing combining marks) — equivalent to the reference's per-char
    ``category(c) != 'Mn'`` filter but vectorizable via Series.str.translate."""
    return {
        cp: None
        for cp in range(sys.maxunicode + 1)
        if unicodedata.category(chr(cp)) == "Mn"
    }


def preprocess_series(s: pd.Series, options: dict | None = None) -> pd.Series:
    """Normalize a Series of strings. None/NaN stay null (the pipeline
    filters nulls before this stage; reference dropna's first)."""
    if options is None:
        # reference None-default: all off (preprocess_helper.py:9-14)
        options = {}
        lowercase = diacritics = punct = False
    else:
        # provided dict: missing keys default True (the reference quirk)
        lowercase = bool(options.get("lowercase", True))
        diacritics = bool(options.get("remove_diacritics", True))
        punct = bool(options.get("remove_punctuation", True))

    mask = s.notna()
    t = s[mask].astype(str)
    if lowercase:
        t = t.str.lower()
    if diacritics:
        t = t.str.normalize("NFD").str.translate(_mn_delete_table()).str.normalize("NFC")
    else:
        t = t.str.normalize("NFC")
    if punct:
        t = t.str.replace(_CLEAN_PATTERN, " ", regex=True)
    t = t.str.replace(_WS_PATTERN, " ", regex=True).str.strip()

    out = pd.Series([None] * len(s), index=s.index, dtype=object)
    out[mask] = t
    return out


def preprocess_udf(options: dict | None):
    """Build a pandas UDF string->string for a fixed option dict."""
    opts = None if options is None else dict(options)

    @pandas_udf(StringType())
    def _preprocess(s: pd.Series) -> pd.Series:
        return preprocess_series(s, opts)

    return _preprocess
