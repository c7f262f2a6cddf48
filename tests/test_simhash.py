"""SimHash unit oracle + vectorized-kernel parity + pipeline Hamming
pre-filter semantics (north_star: "complementary SimHash pass ...
Hamming pre-filter"; VERDICT r01 item 6).

The oracle here is an INDEPENDENT straight-line reimplementation (per-gram
md5 low-64, per-bit integer vote loop) — deliberately not sharing any code
with sparkdedup.functions.signatures — plus pinned literal golden values
so a silent semantic drift in both implementations cannot pass.
"""

import hashlib

import numpy as np
import pytest

from sparkdedup.config import DedupConfig
from sparkdedup.functions.signatures import simhash64_text, simhash_batch
from sparkdedup.io.webtext import generate_webtext, webtext_spark_df
from sparkdedup.pipeline import DedupPipeline


def simhash_oracle(text: str, k: int) -> int:
    """Independent loop-based SimHash: char k-grams (whole text if shorter,
    'empty_document' token if empty), md5 low 8 bytes per gram, signed
    bit votes with multiplicity, two's-complement int64."""
    if not text:
        grams = []
    elif len(text) < k:
        grams = [text]
    else:
        grams = [text[i : i + k] for i in range(len(text) - k + 1)]
    if not grams:
        v = int.from_bytes(hashlib.md5(b"empty_document").digest()[8:], "big")
        return v - (1 << 64) if v >= (1 << 63) else v
    votes = [0] * 64
    for g in grams:
        h = int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[8:], "big")
        for j in range(64):
            votes[j] += 1 if (h >> j) & 1 else -1
    out = 0
    for j in range(64):
        if votes[j] > 0:
            out |= 1 << j
    return out - (1 << 64) if out >= (1 << 63) else out


CASES = ["", "ab", "xxxxx", "the quick brown fox jumps over the lazy dog",
         "日本語のテキストです" * 3, "a b " * 50]


def test_scalar_matches_independent_oracle():
    for t in CASES:
        assert simhash64_text(t, 6) == simhash_oracle(t, 6), repr(t[:20])
    for t in CASES:
        assert simhash64_text(t, 3) == simhash_oracle(t, 3), repr(t[:20])


def test_golden_values_pinned():
    # literal goldens: guard against both implementations drifting together
    assert simhash64_text("the quick brown fox jumps over the lazy dog", 6) == 8199682770357076948
    assert simhash64_text("hello world", 6) == 6871090243627425834
    assert simhash64_text("", 6) == -2420821542465379253


def test_batch_kernel_bit_identical():
    texts = generate_webtext(300, seed=7)["text"].tolist()
    texts += ["", "ab", "x" * 5, "日本語のテキストです" * 3, None, "   "]
    got = simhash_batch(texts, 6)
    for g, t in zip(got, texts):
        assert int(g) == simhash64_text("" if t is None else str(t), 6)


def test_batch_kernel_chunking_boundary():
    # force multiple chunks: docs large enough that the 2^18-gram chunk
    # boundary falls mid-batch
    texts = ["".join(chr(97 + (i * 7 + j) % 26) for j in range(9000)) for i in range(40)]
    texts.insert(13, "")  # empty doc inside a chunk exercises the fallback
    got = simhash_batch(texts, 6)
    for g, t in zip(got, texts):
        assert int(g) == simhash64_text(t, 6)


def _edge_set(df):
    return {(r["src"], r["dst"], round(r["sim"], 9)) for r in df.collect()}


@pytest.fixture(scope="module")
def corpus(spark):
    return webtext_spark_df(spark, 300, seed=42).localCheckpoint(eager=True)


def test_hamming_64_is_noop(spark, corpus):
    """hamming <= 64 always holds -> pre-filter must not change the edge
    set (proves the filter plumbing is sound)."""
    base = DedupPipeline(spark, DedupConfig(threshold=0.3, shingle_size=6)).run(corpus)
    filt = DedupPipeline(
        spark, DedupConfig(threshold=0.3, shingle_size=6, simhash_hamming_max=64)
    ).run(corpus)
    assert _edge_set(base["edges"]) == _edge_set(filt["edges"])


def test_hamming_prefilter_is_subset_and_keeps_near_dups(spark, corpus):
    """The pre-filter is a recall-trading knob: MinHash estimates set
    Jaccard while SimHash votes with gram MULTIPLICITY, so even a
    sim-1.0 pair (identical shingle sets, different repetition counts)
    can sit at Hamming >~ 20.  Assert the subset property plus measured
    recall of strong edges, not keep-all."""
    base = DedupPipeline(spark, DedupConfig(threshold=0.3, shingle_size=6)).run(corpus)
    filt = DedupPipeline(
        spark, DedupConfig(threshold=0.3, shingle_size=6, simhash_hamming_max=16)
    ).run(corpus)
    e_base, e_filt = _edge_set(base["edges"]), _edge_set(filt["edges"])
    assert e_filt <= e_base
    strong = {e for e in e_base if e[2] >= 0.8}
    assert strong, "fixture should contain strong near-dup edges"
    kept = strong & e_filt
    assert len(kept) / len(strong) >= 0.95
    # byte-identical texts have Hamming 0 — always survive
    pdf = generate_webtext(300, seed=42)
    texts = pdf["text"].tolist()
    exact = {e for e in strong if texts[e[0]] == texts[e[1]]}
    assert exact <= e_filt
