"""Suffix-automaton LCS + substring-edge stage tests."""

import random

from pyspark.sql import functions as F

from sparkdedup.operators.substring import longest_common_substring, substring_edges


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
