"""Suffix-automaton LCS + substring-edge stage tests (incl. the stage
wired into the pipeline DAG — SURVEY §7 stage 7 / VERDICT r01 item 5)."""

import random

from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig
from sparkdedup.io.webtext import webtext_spark_df
from sparkdedup.operators.substring import longest_common_substring, substring_edges
from sparkdedup.pipeline import DedupPipeline


def _lcs_bruteforce(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(i + best + 1, len(a) + 1):
            if a[i:j] in b:
                best = j - i
            else:
                break
    return best


def test_lcs_basics():
    assert longest_common_substring("", "abc") == 0
    assert longest_common_substring("abc", "") == 0
    assert longest_common_substring("abc", "abc") == 3
    assert longest_common_substring("xabcy", "zabcw") == 3
    assert longest_common_substring("abcdef", "ghijkl") == 0
    assert longest_common_substring("aaaa", "aa") == 2


def test_lcs_matches_bruteforce():
    rng = random.Random(3)
    for _ in range(60):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 24)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 24)))
        assert longest_common_substring(a, b) == _lcs_bruteforce(a, b), (a, b)


def test_substring_edges_stage(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "a quick brown fox jumps over the lazy cat instead!!"),
            (2, "completely unrelated text with no shared spans here"),
        ],
        "doc_id long, clean string",
    )
    pairs = spark.createDataFrame([(0, 1), (0, 2), (1, 2)], "src long, dst long")
    out = substring_edges(pairs, docs, min_span=20)
    rows = {(r["src"], r["dst"]): r["lcs_len"] for r in out.collect()}
    assert (0, 1) in rows and rows[(0, 1)] >= 30  # " quick brown fox jumps over the lazy "
    assert (0, 2) not in rows and (1, 2) not in rows
    # fraction column sane
    fr = out.where((F.col("src") == 0) & (F.col("dst") == 1)).collect()[0]["lcs_frac"]
    assert 0.0 < fr <= 1.0


def test_substring_stage_in_pipeline(spark):
    """substring_min_span wires stage 7 into run(): spans are computed over
    exactly the LSH candidate pairs, values match a brute-force LCS on the
    clean text, and assignments stay identical to a run without the stage
    (the stage is additive, not graph-mutating)."""
    sdf = webtext_spark_df(spark, 200, seed=42).localCheckpoint(eager=True)
    cfg = DedupConfig(threshold=0.3, shingle_size=6, substring_min_span=40)
    out = DedupPipeline(spark, cfg).run(sdf)
    assert "substring_edges" in out
    sub = {(r["src"], r["dst"]): (r["lcs_len"], r["lcs_frac"]) for r in out["substring_edges"].collect()}
    assert sub, "fixture near-dups share long spans"

    clean = {r["doc_id"]: r["clean"] for r in out["clean"].collect()}
    # every emitted span is >= min_span and matches brute force on a sample
    sample = list(sub.items())[:25]
    for (s, d), (ln, fr) in sample:
        assert ln >= 40
        a, b = clean[s], clean[d]
        if len(a) > len(b):
            a, b = b, a
        assert ln == _lcs_bruteforce(a, b), (s, d)
        assert fr == round(ln / len(a), 6)

    base = DedupPipeline(spark, DedupConfig(threshold=0.3, shingle_size=6)).run(sdf)
    got = {(r["doc_id"], r["cluster_id"]) for r in out["assignments"].collect()}
    want = {(r["doc_id"], r["cluster_id"]) for r in base["assignments"].collect()}
    assert got == want
