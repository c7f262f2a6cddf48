"""HTML -> text extraction pandas UDF.

The reference consumes pre-extracted text (its CSV already has a `text`
column); the input_hint table carries `html binary` + `text string` with
the invariant that extraction is byte-identical per url.  The extractor is
deterministic and dependency-free: utf-8 decode, drop <script>/<style>
blocks, strip tags, unescape entities.  Fixture HTML (FIXTURES.md §1)
round-trips exactly through this function.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SCRIPT_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG = re.compile(r"<[^>]*>")


def extract_text_bytes(raw: bytes | None) -> str | None:
    if raw is None:
        return None
    s = raw.decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE.sub("", s)
    s = _TAG.sub("", s)
    return _html.unescape(s)


def extract_series(s: pd.Series) -> pd.Series:
    t = s.map(lambda b: None if b is None else bytes(b).decode("utf-8", errors="replace"))
    mask = t.notna()
    u = t[mask]
    u = u.str.replace(_SCRIPT_STYLE, "", regex=True)
    u = u.str.replace(_TAG, "", regex=True)
    u = u.map(_html.unescape)
    out = pd.Series([None] * len(s), index=s.index, dtype=object)
    out[mask] = u
    return out


@pandas_udf(StringType())
def extract_text_udf(s: pd.Series) -> pd.Series:
    return extract_series(s)
