"""Exact-substring dedup stage (north_star addition; no reference
equivalent): for candidate pairs, find the longest common substring via a
suffix automaton and emit edges for pairs sharing a span >= min_span.

Runs AFTER LSH candidate generation, so the work is pairwise over an
already-pruned pair set — not corpus-global suffix construction.  The
automaton is linear in |text| per pair and runs inside mapInPandas (Arrow
batches); the join attaching both texts is plain Spark.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def longest_common_substring(a: str, b: str) -> int:
    """Length of the longest common substring, via the suffix automaton of
    `a` (O(|a|) build, O(|b|) query — public-textbook algorithm)."""
    if not a or not b:
        return 0
    # suffix automaton build over `a`
    # states: link[], length[], transitions list of dicts
    link = [-1]
    length = [0]
    trans: list[dict[str, int]] = [{}]
    last = 0
    for ch in a:
        cur = len(length)
        length.append(length[last] + 1)
        link.append(0)
        trans.append({})
        p = last
        while p != -1 and ch not in trans[p]:
            trans[p][ch] = cur
            p = link[p]
        if p != -1:
            q = trans[p][ch]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = len(length)
                length.append(length[p] + 1)
                link.append(link[q])
                trans.append(dict(trans[q]))
                while p != -1 and trans[p].get(ch) == q:
                    trans[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    # stream `b` through the automaton
    v, cur_len, best = 0, 0, 0
    for ch in b:
        while v and ch not in trans[v]:
            v = link[v]
            cur_len = length[v]
        if ch in trans[v]:
            v = trans[v][ch]
            cur_len += 1
            if cur_len > best:
                best = cur_len
    return best


_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("lcs_len", LongType()),
        StructField("lcs_frac", DoubleType()),
    ]
)


def substring_edges(
    pairs: DataFrame,
    clean: DataFrame,
    min_span: int = 32,
    id_col: str = "doc_id",
    text_col: str = "clean",
) -> DataFrame:
    """(src, dst) pairs + (doc_id, clean) texts -> pairs whose longest
    shared exact span >= min_span, with span length and fraction of the
    shorter text covered."""
    t1 = clean.select(F.col(id_col).alias("src"), F.col(text_col).alias("_t1"))
    t2 = clean.select(F.col(id_col).alias("dst"), F.col(text_col).alias("_t2"))
    joined = pairs.select("src", "dst").join(t1, "src").join(t2, "dst")

    def _lcs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ls, fr = [], []
            for a, b in zip(pdf["_t1"], pdf["_t2"]):
                a = a or ""
                b = b or ""
                # build the automaton on the shorter string
                if len(a) > len(b):
                    a, b = b, a
                n = longest_common_substring(a, b)
                ls.append(n)
                fr.append(0.0 if not a else round(n / len(a), 6))
            yield pd.DataFrame(
                {"src": pdf["src"], "dst": pdf["dst"], "lcs_len": ls, "lcs_frac": fr}
            )

    return (
        joined.mapInPandas(_lcs, _SCHEMA)
        .where(F.col("lcs_len") >= F.lit(min_span))
    )
