"""Textstats vectorization parity (VERDICT r01 item 9): the batched
kernels must be value-identical to the per-row reference implementations
(which stay in the module as the semantic spec), and the SQL-expressible
lang-id twin in __spark_entry__ must agree with the pandas-UDF path.
"""

import sys

import pandas as pd
import pytest

from sparkdedup.functions.textstats import (
    _BPEISH,
    lang_id_batch,
    lang_id_text,
    quality_score_batch,
    quality_score_text,
)

CASES = [
    None,
    "",
    "   ",
    "the cat and the dog sit in the house for a while",
    "der hund und die katze sind nicht mit auf dem sofa",
    "el perro y la casa que es en un lugar por ahora",
    "le chien est dans la maison pour les vacances",
    "μῆνιν ἄειδε θεὰ Πηληϊάδεω Ἀχιλῆος",
    "这是一个中文句子用于测试语言识别",
    "これは日本語のテストです",
    "zzz qqq xxx www",
    "data data data data",
    "Mixed THE case AND punctuation!!! der?",
    "a",
    "tabs\tand\nnewlines the and of to",
]


def test_lang_id_batch_matches_scalar():
    s = pd.Series(CASES)
    got = lang_id_batch(s)
    for i, t in enumerate(CASES):
        want = "und" if t is None else lang_id_text(str(t))
        assert got.iloc[i] == want, (i, t, got.iloc[i], want)


def test_lang_id_batch_on_fixture_corpus():
    from sparkdedup.io.webtext import generate_webtext

    texts = generate_webtext(400, seed=11)["text"]
    got = lang_id_batch(texts)
    want = texts.map(lambda t: lang_id_text(str(t)))
    assert (got == want).all()


def test_quality_score_batch_matches_scalar():
    from sparkdedup.io.webtext import generate_webtext

    texts = list(generate_webtext(300, seed=5)["text"]) + CASES
    s = pd.Series(texts)
    got = quality_score_batch(s)
    for i, t in enumerate(texts):
        want = 0.0 if t is None else quality_score_text(str(t))
        assert got.iloc[i] == pytest.approx(want, abs=0), (i, t)


def test_token_count_vectorized_matches_findall():
    texts = [t for t in CASES if t is not None] + ["a,b.c!d", "  x  "]
    s = pd.Series(texts)
    got = s.str.count(_BPEISH).astype("int64")
    for i, t in enumerate(texts):
        assert got.iloc[i] == len(_BPEISH.findall(t))


def test_sql_lang_id_matches_udf(spark, tmp_path):
    """__spark_entry__._text_lang_id (pure SQL, DuckDB-oracle-able) must
    agree with the pandas-UDF twin on the documents fixture."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em
    from sparkdedup.functions.textstats import lang_id_udf
    from sparkdedup.io.webtext import generate_webtext

    pdf = generate_webtext(250, seed=3).reset_index().rename(columns={"index": "doc_id"})
    p = str(tmp_path / "documents.parquet")
    pdf[["doc_id", "text", "lang"]].to_parquet(p, index=False)
    sql_res = {
        r["doc_id"]: r["lang_pred"]
        for r in em._text_lang_id(spark, str(tmp_path)).collect()
    }
    sdf = spark.read.parquet(p)
    udf_res = {
        r["doc_id"]: r["lang_pred"]
        for r in sdf.select("doc_id", lang_id_udf("text").alias("lang_pred")).collect()
    }
    assert sql_res == udf_res


def test_fingerprint_batch_matches_scalar():
    """The vectorized mod-(2^61-1) winnowing kernel must be bit-identical
    to the per-row rolling-hash spec twin, across lengths, unicode, empty,
    None, and non-default (window, keep)."""
    import random

    from sparkdedup.functions.textstats import (
        fingerprint_batch,
        rolling_fingerprint_text,
    )

    rng = random.Random(11)
    texts = ["", "short", "a" * 15, "a" * 16, None, "üñïçødé ́ tëxt" * 3]
    texts += [
        "".join(rng.choice("abcxyz.,;! \n") for _ in range(rng.randint(1, 400)))
        for _ in range(150)
    ]
    for window, keep in ((16, 4), (8, 7), (32, 2)):
        got = fingerprint_batch(texts, window, keep)
        for i, t in enumerate(texts):
            want = None if t is None else rolling_fingerprint_text(str(t), window, keep)
            assert got[i] == want, (window, keep, i, repr(t)[:40])


def test_fingerprint_batch_property():
    """Property-based: arbitrary unicode texts (including exotic
    codepoints, whitespace runs, and empty strings) produce identical
    fingerprints through the vectorized and scalar kernels."""
    from hypothesis import given, settings, strategies as st

    from sparkdedup.functions.textstats import (
        fingerprint_batch,
        rolling_fingerprint_text,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.text(max_size=200)), min_size=1, max_size=8
        ),
        st.integers(min_value=2, max_value=24),
        st.integers(min_value=1, max_value=8),
    )
    def _prop(texts, window, keep):
        got = fingerprint_batch(texts, window, keep)
        for i, t in enumerate(texts):
            want = None if t is None else rolling_fingerprint_text(str(t), window, keep)
            assert got[i] == want

    _prop()


def test_fingerprint_batch_chunked_parity(monkeypatch):
    """ADVICE r03: the byte-budget sub-batching inside fingerprint_batch
    must not change any output — force pathological chunk boundaries
    (every doc its own chunk, and mid-list splits) and compare to the
    unchunked kernel + the scalar spec."""
    import sparkdedup.functions.textstats as ts

    texts = [
        "the quick brown fox jumps over the lazy dog " * 8,
        None,
        "",
        "short",
        "pack my box with five dozen liquor jugs " * 5,
        "x" * 100,
        None,
        "sphinx of black quartz judge my vow " * 3,
    ]
    want = ts.fingerprint_batch(texts, 16, 4)  # default ~48MB: one chunk
    for budget in (1, 50, 200):
        monkeypatch.setattr(ts, "_FP_CHUNK_BYTES", budget)
        assert ts.fingerprint_batch(texts, 16, 4) == want
    monkeypatch.undo()
    for t, w in zip(texts, want):
        scalar = None if t is None else ts.rolling_fingerprint_text(str(t), 16, 4)
        assert w == scalar
