"""S1 preprocess parity: pandas-UDF implementation vs the byte-exact
reference semantics (preprocess_helper.py:8-36), including the
None-vs-missing-key default quirk (SURVEY.md §2.3 S1)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkdedup.functions.preprocess import preprocess_series

from .oracle import preprocess_text_ref

CASES = [
    "Hello, World!",
    "  multiple   spaces\tand\ttabs\nnewlines  ",
    "CaFé RÉSUMÉ über naïve",
    "ᾤκησεν ἐν τῇ πόλει ταύτῃ",
    "éclair",  # decomposed combining acute
    "½ @#$%^ punct-only!!!",
    "",
    " ",
    "日本語テキスト、句読点。",
    "ligature ﬁne ﬂow",
    "mixed ABC def ÄÖÜ ß",
]

OPTION_SETS = [
    None,
    {},
    {"lowercase": True},
    {"lowercase": False},
    {"remove_diacritics": True, "remove_punctuation": False},
    {"lowercase": False, "remove_diacritics": False, "remove_punctuation": False},
    {"lowercase": True, "remove_diacritics": True, "remove_punctuation": True},
]


@pytest.mark.parametrize("options", OPTION_SETS)
def test_preprocess_parity(options):
    got = preprocess_series(pd.Series(CASES), options)
    for raw, out in zip(CASES, got):
        assert out == preprocess_text_ref(raw, options), (raw, options)


def test_none_vs_empty_dict_quirk():
    # options=None -> everything off; options={} -> everything ON
    s = pd.Series(["CaFé!"])
    assert preprocess_series(s, None)[0] == "CaFé!"
    assert preprocess_series(s, {})[0] == "cafe"


def test_nulls_stay_null():
    out = preprocess_series(pd.Series(["a", None, "b"]), {})
    assert out[1] is None


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80), st.booleans(), st.booleans(), st.booleans())
def test_preprocess_parity_property(text, lc, dia, punct):
    opts = {"lowercase": lc, "remove_diacritics": dia, "remove_punctuation": punct}
    got = preprocess_series(pd.Series([text]), opts)[0]
    assert got == preprocess_text_ref(text, opts)


def test_preprocess_udf_in_spark(spark):
    from pyspark.sql import functions as F

    from sparkdedup.functions.preprocess import preprocess_udf

    df = spark.createDataFrame([(t,) for t in CASES if t], "text string")
    udf = preprocess_udf({"lowercase": True, "remove_diacritics": True, "remove_punctuation": True})
    got = {r["text"]: r["clean"] for r in df.withColumn("clean", udf(F.col("text"))).collect()}
    for t, c in got.items():
        assert c == preprocess_text_ref(t, {})
