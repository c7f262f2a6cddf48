"""Signature/banding parity: vectorized sparkdedup core vs the loop-based
reference oracle (SURVEY.md §5 parity tests a-c)."""

import numpy as np
import pytest

from sparkdedup.config import optimal_param
from sparkdedup.minhash import batch_signatures, jaccard, minhash_signature

from .oracle import (
    minhash_ref,
    optimal_param_ref,
    preprocess_text_ref,
    shingles_ref,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "The quick brown fox jumped over the lazy dog!",
    "",
    " ",
    "ab",  # shorter than shingle_size -> single whole-text shingle
    "a",
    "résumé naïve Zürich — café ☕ über",
    "ᾤκησεν ἐν τῇ πόλει ταύτῃ",  # polytonic greek w/ combining-mark history
    "same same same same same same same same",
    "x" * 500,
    "日本語のテキストです。重複検出のテスト。",
    "tab\tand\nnewline  and   spaces",
]


@pytest.mark.parametrize("shingle_size", [2, 4, 6])
def test_signature_parity(shingle_size):
    for t in TEXTS:
        ours = minhash_signature(t, shingle_size)
        ref = minhash_ref(shingles_ref(t, shingle_size))
        assert ours.dtype == np.uint64
        assert np.array_equal(ours, ref), (t[:40], shingle_size)


def test_batch_signature_parity():
    sigs = batch_signatures(TEXTS, 4)
    for i, t in enumerate(TEXTS):
        ref = minhash_ref(shingles_ref(t, 4))
        assert np.array_equal(sigs[i], ref)


def test_signature_range_and_shape():
    sigs = batch_signatures(TEXTS, 4, num_perm=64)
    assert sigs.shape == (len(TEXTS), 64)
    assert (sigs <= np.uint64((1 << 32) - 1)).all()


def test_empty_and_none_like():
    # empty and whitespace-only preprocess to '' -> 'empty_document' token
    e1 = minhash_signature("", 4)
    e2 = minhash_signature(preprocess_text_ref("   \t  "), 4)
    assert np.array_equal(e1, e2)


def test_identical_texts_identical_sigs():
    s = batch_signatures(["hello world doc", "hello world doc"], 4)
    assert np.array_equal(s[0], s[1])
    assert jaccard(s[0], s[1]) == 1.0


def test_jaccard_matches_reference_estimate():
    s = batch_signatures(TEXTS[:2], 4)
    ref0 = minhash_ref(shingles_ref(TEXTS[0], 4))
    ref1 = minhash_ref(shingles_ref(TEXTS[1], 4))
    expected = float(np.count_nonzero(ref0 == ref1)) / 64.0
    assert jaccard(s[0], s[1]) == expected
    assert 0.0 < expected < 1.0  # near-dup pair: informative estimate


@pytest.mark.parametrize(
    "threshold,expected",
    [(0.2, (28, 2)), (0.3, (21, 3)), (0.5, (14, 4)), (0.8, (5, 11))],
)
def test_optimal_param_table(threshold, expected):
    # SURVEY.md §2.4 (b, r) table at num_perm=64
    assert optimal_param(threshold, 64) == expected
    assert optimal_param_ref(threshold, 64) == expected


def test_optimal_param_128():
    assert optimal_param(0.3, 128) == optimal_param_ref(0.3, 128)


def test_num_perm_128_parity():
    for t in TEXTS[:4]:
        ours = minhash_signature(t, 4, num_perm=128)
        ref = minhash_ref(shingles_ref(t, 4), num_perm=128)
        assert np.array_equal(ours, ref)
