"""Deterministic synthetic Common-Crawl-style webtext corpus (FIXTURES.md §1).

Mirrors the *structure* of the reference's labeled demo set
(/root/reference/app/demo_data/paper_verses.csv: 575 short texts, 31
ground-truth groups, heavy-tailed sizes): groups of edit-noise clones of a
seed sentence, plus edge-case rows (empty / whitespace / shorter-than-k /
exact duplicates / hot boilerplate group / combining-mark unicode).

Schema matches BASELINE.json input_hint:
    url string, warc_ts timestamp, html binary, text string, lang string
plus ground-truth `group_id` (side information for quality metrics only —
the pipeline never reads it).  `html` wraps `text` so extract_text(html)
round-trips byte-identically (the per-row invariant).
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

# rich syllable inventory (~360): a tiny inventory makes every word share
# the same handful of character 6-grams, which collapses MinHash minima
# into giant junk band-buckets corpus-wide — unrealistically low character
# entropy vs real webtext (measured: top bucket 3640 vs 7 per 20k docs)
_CONS = "bcdfghjklmnpqrstvwxz"
_VOW = "aeiouy"
_VOCAB_SYLLABLES = [c + v for c in _CONS for v in _VOW] + [
    c + v + c2 for c in _CONS[:10] for v in _VOW for c2 in "nrst"
]
_LANGS = ["en", "de", "el", "es", "fr"]
_DIACRITIC_SWAP = {"e": "é", "a": "à", "o": "ö", "u": "ü", "i": "ï"}
_PUNCT = list(".,;:!?-'\"()")  # never <, >, & : keeps html round-trip exact


def _vocab(rng: random.Random, n: int = 400) -> list[str]:
    words = set()
    while len(words) < n:
        w = "".join(rng.choice(_VOCAB_SYLLABLES) for _ in range(rng.randint(2, 4)))
        words.add(w)
    return sorted(words)


def _noise(rng: random.Random, text: str, n_edits: int) -> str:
    chars = list(text)
    for _ in range(n_edits):
        if not chars:
            break
        op = rng.randint(0, 4)
        pos = rng.randrange(len(chars))
        if op == 0:  # substitution
            chars[pos] = rng.choice("abcdefghijklmnopqrstuvwxyz")
        elif op == 1:  # deletion
            del chars[pos]
        elif op == 2:  # insertion
            chars.insert(pos, rng.choice("abcdefghijklmnopqrstuvwxyz "))
        elif op == 3:  # case flip
            chars[pos] = chars[pos].swapcase()
        else:  # diacritic swap or punctuation injection
            c = chars[pos].lower()
            if c in _DIACRITIC_SWAP:
                chars[pos] = _DIACRITIC_SWAP[c]
            else:
                chars.insert(pos, rng.choice(_PUNCT))
    return "".join(chars)


def _group_sizes(n_rows: int, rng: random.Random, max_group_size: int = 500) -> list[int]:
    """Heavy-tailed sizes summing to ~n_rows (one dominant group, then a
    zipf-ish tail down to singletons).  Sizes are capped so a huge corpus
    doesn't turn into one quadratic near-dup cluster (candidate pairs per
    group scale with size^2)."""
    sizes = []
    remaining = n_rows
    head = [0.18, 0.09, 0.06, 0.045, 0.03, 0.025, 0.02, 0.015]
    for frac in head:
        s = min(max(2, int(n_rows * frac)), max_group_size)
        if s > remaining - 1:
            break
        sizes.append(s)
        remaining -= s
    while remaining > 0:
        s = min(remaining, max_group_size, max(1, int(rng.paretovariate(1.2))))
        sizes.append(s)
        remaining -= s
    return sizes


def generate_webtext(
    n_rows: int,
    seed: int = 42,
    max_group_size: int = 500,
    words_range: tuple[int, int] = (5, 11),
    vocab_size: int = 400,
) -> pd.DataFrame:
    """`words_range` controls document length: the default mirrors the
    reference's short-verse corpus (~40 chars); pass e.g. (60, 140) for
    web-page-like ~0.5-1.2 KB documents (bench fixtures).

    `vocab_size` must scale with document length: long documents over a
    tiny vocabulary share so many intra-word shingles that UNRELATED docs
    reach Jaccard ~0.2 and LSH banding floods with cross-group candidates
    (a quadratic blowup no engine survives); real language at ~1 KB/doc
    corresponds to several thousand common words."""
    rng = random.Random(seed)
    vocab = _vocab(rng, vocab_size)
    rows: list[dict] = []
    group_id = 0

    def emit(text: str, gid: int):
        i = len(rows)
        url = f"https://site{i % 200}.example/p/{i}"
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=37 * i)
        html = b"<html><body><p>" + text.encode("utf-8") + b"</p></body></html>"
        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html,
                "text": text,
                "lang": _LANGS[gid % len(_LANGS)],
                "group_id": gid,
            }
        )

    # fixed edge-case rows first (stable doc_ids for debugging)
    edge_cases = [
        "",  # empty -> 'empty_document' token
        "   ",  # whitespace-only
        "ab",  # shorter than any shingle_size >= 3
        "ab",  # exact duplicate of the short one
        "ᾤκησεν ἐν τῇ πόλει",  # combining-mark unicode (NFD/Mn parity)
        "résumé naïve café über",
    ]
    for t in edge_cases:
        emit(t, group_id)
        group_id += 1

    budget = n_rows - len(rows)
    for size in _group_sizes(budget, rng, max_group_size):
        n_words = rng.randint(*words_range)
        seed_sentence = " ".join(rng.choice(vocab) for _ in range(n_words))
        # edit count scales with length so clone similarity stays in the
        # near-dup range instead of converging to exact-dup on long docs
        max_edits = max(3, n_words // 4)
        for j in range(size):
            if j == 0:
                emit(seed_sentence, group_id)
            elif j == 1 and size >= 4:
                emit(seed_sentence, group_id)  # exact duplicate inside group
            else:
                emit(_noise(rng, seed_sentence, rng.randint(1, max_edits)), group_id)
        group_id += 1
        if len(rows) >= n_rows:
            break

    return pd.DataFrame(rows[:n_rows])


def webtext_spark_df(spark, n_rows: int, seed: int = 42, with_doc_id: bool = True):
    """Spark DataFrame over the synthetic corpus; doc_id = input row order
    (the reference's dense id assignment, cluster_in_mem.py:86)."""
    pdf = generate_webtext(n_rows, seed)
    if with_doc_id:
        pdf = pdf.reset_index().rename(columns={"index": "doc_id"})
    return spark.createDataFrame(pdf)
