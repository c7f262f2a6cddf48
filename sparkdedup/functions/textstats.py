"""Text-analysis pandas UDFs for training-data pipelines: heuristic
language ID, quality scoring, token counting, rolling-hash fingerprints.

All Arrow-batched (no per-row Spark UDFs).  Language ID is a deterministic
character-n-gram/stopword heuristic — no external models (sandbox has no
fasttext/langdetect), which also keeps it reproducible at scale.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StringType

# tiny per-language marker sets: common function words + characteristic
# character patterns; a deterministic vote, not a statistical model
_LANG_MARKERS: dict[str, tuple[set[str], str]] = {
    "en": ({"the", "and", "of", "to", "is", "in", "that", "it", "for", "with"}, r"th|ing\b|\bwh"),
    "de": ({"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"}, r"sch|ung\b|ß"),
    "es": ({"el", "la", "los", "las", "que", "de", "es", "en", "un", "una", "por"}, r"ción\b|ñ|\bll"),
    "fr": ({"le", "la", "les", "des", "est", "et", "une", "dans", "pour", "que"}, r"eau|aux\b|ç"),
    "el": (set(), r"[Ͱ-Ͽἀ-῿]"),
    "zh": (set(), r"[一-鿿]"),
    "ja": (set(), r"[぀-ヿ]"),
}
_TOKEN_RE = re.compile(r"\s+")


def lang_id_text(text: str) -> str:
    if not text or not text.strip():
        return "und"
    low = text.lower()
    tokens = set(_TOKEN_RE.split(low.strip()))
    best, best_score = "und", 0.0
    for lang, (stopwords, pattern) in _LANG_MARKERS.items():
        score = float(len(tokens & stopwords))
        score += 2.0 * len(re.findall(pattern, low))
        if score > best_score:
            best, best_score = lang, score
    return best


def lang_id_batch(s: pd.Series) -> pd.Series:
    """Vectorized language ID, identical to per-row ``lang_id_text``.

    Stopword scores via one explode + token->language join over the whole
    batch (distinct tokens per row, like the per-row set intersection);
    pattern scores via one ``Series.str.count`` per language.  Replaces
    the round-1 per-row ``s.map`` + 7x ``re.findall`` (input_hint: no
    per-row Python)."""
    orig_index = s.index
    low = s.reset_index(drop=True).fillna("").astype(str).str.lower()
    langs = list(_LANG_MARKERS)
    scores = np.zeros((len(low), len(langs)), dtype=np.float64)
    # pattern votes: 2 * non-overlapping match count, one pass per language
    for j, lang in enumerate(langs):
        scores[:, j] += 2.0 * low.str.count(_LANG_MARKERS[lang][1]).to_numpy()
    # stopword votes: explode tokens, dedup per row, join to the
    # (token -> language) table, scatter-add per (row, language)
    tok2lang = [(w, j) for j, lang in enumerate(langs) for w in _LANG_MARKERS[lang][0]]
    toks = low.str.strip().str.split(r"\s+", regex=True).explode()
    toks = toks[toks.notna()]
    tdf = pd.DataFrame({"row": toks.index.to_numpy(), "tok": toks.to_numpy()})
    tdf = tdf.drop_duplicates()
    m = tdf.merge(pd.DataFrame(tok2lang, columns=["tok", "lang_j"]), on="tok")
    if len(m):
        np.add.at(scores, (m["row"].to_numpy(), m["lang_j"].to_numpy()), 1.0)
    best_j = scores.argmax(axis=1)  # first max wins = dict-order tie-break
    best = scores.max(axis=1)
    out = np.where(best > 0, np.array(langs, dtype=object)[best_j], "und")
    out[~low.str.strip().astype(bool).to_numpy()] = "und"
    return pd.Series(out, index=orig_index, dtype=object)


@pandas_udf(StringType())
def lang_id_udf(s: pd.Series) -> pd.Series:
    return lang_id_batch(s)


def quality_score_text(text: str) -> float:
    """[0, 1] heuristic: rewards word-like length distribution and
    alphanumeric density, penalizes extreme repetition — the
    length/punct/stopword-ratio family of web-corpus quality filters."""
    if not text:
        return 0.0
    n = len(text)
    tokens = [t for t in _TOKEN_RE.split(text.strip()) if t]
    if not tokens:
        return 0.0
    mean_tok = sum(len(t) for t in tokens) / len(tokens)
    len_score = max(0.0, 1.0 - abs(mean_tok - 5.0) / 10.0)
    alnum = sum(c.isalnum() or c.isspace() for c in text) / n
    uniq = len(set(tokens)) / len(tokens)
    return round(0.4 * len_score + 0.4 * alnum + 0.2 * uniq, 6)


def quality_score_batch(s: pd.Series) -> pd.Series:
    """Vectorized quality score, identical to ``quality_score_text``:
    one explode for token stats, one regex count for alnum density."""
    orig_index = s.index
    txt = s.reset_index(drop=True).fillna("").astype(str)
    n = txt.str.len().to_numpy(dtype=np.float64)
    toks = txt.str.strip().str.split(r"\s+", regex=True).explode()
    toks = toks[toks.notna() & (toks != "")]
    rows = toks.index.to_numpy()
    tok_len = toks.str.len().to_numpy(dtype=np.float64)
    n_tok = np.zeros(len(txt))
    sum_len = np.zeros(len(txt))
    np.add.at(n_tok, rows, 1.0)
    np.add.at(sum_len, rows, tok_len)
    uniq = toks.groupby(level=0).nunique()
    n_uniq = np.zeros(len(txt))
    n_uniq[uniq.index.to_numpy()] = uniq.to_numpy(dtype=np.float64)
    # python str.isalnum()/isspace() == unicode alnum-or-space; the regex
    # class [^\W_] is the \w word class minus underscore = unicode alnum
    alnum = txt.str.count(r"[^\W_]|\s").to_numpy(dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_tok = np.where(n_tok > 0, sum_len / np.maximum(n_tok, 1), 0.0)
        len_score = np.maximum(0.0, 1.0 - np.abs(mean_tok - 5.0) / 10.0)
        score = (
            0.4 * len_score
            + 0.4 * np.where(n > 0, alnum / np.maximum(n, 1), 0.0)
            + 0.2 * np.where(n_tok > 0, n_uniq / np.maximum(n_tok, 1), 0.0)
        )
    score = np.where((n > 0) & (n_tok > 0), np.round(score, 6), 0.0)
    return pd.Series(score, index=orig_index, dtype=float)


@pandas_udf(DoubleType())
def quality_score_udf(s: pd.Series) -> pd.Series:
    return quality_score_batch(s)


_BPEISH = re.compile(r"\w+|[^\w\s]")


@pandas_udf(LongType())
def token_count_udf(s: pd.Series) -> pd.Series:
    """BPE-ish token proxy: word + punctuation pieces — vectorized
    ``str.count`` (== len(findall), non-overlapping)."""
    return s.fillna("").astype(str).str.count(_BPEISH).astype("int64")


def rolling_fingerprint_text(text: str, window: int = 16, keep: int = 4) -> list[int]:
    """Winnowing-style document fingerprint: polynomial rolling hash over
    byte windows, keep the `keep` smallest distinct hashes (deterministic,
    order-free document sketch).  Scalar spec twin of
    ``fingerprint_batch`` — kept for parity tests only; the UDF path is
    fully vectorized."""
    data = text.encode("utf-8")
    if len(data) < window:
        data = data + b"\x00" * (window - len(data))
    B, M = 257, (1 << 61) - 1
    h = 0
    pw = pow(B, window - 1, M)
    hashes = set()
    for i, byte in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * pw) % M
        h = (h * B + byte) % M
        if i >= window - 1:
            hashes.add(h)
    smallest = sorted(hashes)[:keep]
    return [np.uint64(x).astype(np.int64).item() for x in smallest]


def fingerprint_batch(texts, window: int = 16, keep: int = 4) -> list:
    """Vectorized winnowing fingerprints for a batch of texts — identical
    output to per-row ``rolling_fingerprint_text`` (pinned by
    tests/test_textstats.py), but with no per-row/per-byte Python loops:

      * all docs' utf-8 bytes (short docs zero-padded to one window) are
        concatenated into ONE array — int64, NOT uint64: every mod-step
        intermediate stays < 2^62 (signed-safe) and numpy's uint64
        multiply/shift kernels hit a ~40x slow path on this host class
        (measured 6.8s vs 0.15s per 16 Mops);
      * window hashes come from 16 shifted whole-array multiply-adds in
        mod-(2^61-1) arithmetic — each multiplier split into 32-bit halves
        with the *2^32 part folded by the Mersenne identity 2^61 ≡ 1
        (mod M) — the direct polynomial form of the scalar rolling hash
        (same values);
      * cross-document windows are masked out by offset arithmetic;
      * per-doc distinct + k-smallest via one lexsort + adjacent-dedup +
        rank-within-group selection;
      * the batch is processed in sub-batches of <= _FP_CHUNK_BYTES of
        concatenated text (ADVICE r03): the kernel's transient working set
        is ~5 int64 arrays over the concatenated bytes (~40 B per input
        byte), so one 10k-row Arrow batch of multi-KB web docs would
        otherwise allocate GBs per concurrent UDF call — with 32 workers
        that is exactly the first-touch-fault storm this host punishes.
        Chunking bounds peak transient memory at ~40 B x 48 MB ≈ 2 GB
        per worker worst-case, while keeping each kernel call big enough
        to stay fully vectorized.
    """
    enc = [None if t is None else str(t).encode("utf-8") for t in texts]
    datas = [
        None if d is None else (d + b"\x00" * (window - len(d)) if len(d) < window else d)
        for d in enc
    ]
    out: list = [None] * len(texts)
    present_all = [i for i, d in enumerate(datas) if d is not None]
    if not present_all:
        return out
    # split by cumulative byte budget; every chunk is a contiguous slice of
    # the present docs so the kernel's offset arithmetic is unchanged
    chunks: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for i in present_all:
        cur.append(i)
        cur_bytes += len(datas[i])
        if cur_bytes >= _FP_CHUNK_BYTES:
            chunks.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        chunks.append(cur)
    for present in chunks:
        _fingerprint_block(datas, present, out, window, keep)
    return out


_FP_CHUNK_BYTES = 48 << 20  # ~48 MB of concatenated text per kernel call


def _fingerprint_block(
    datas: list, present: list[int], out: list, window: int, keep: int
) -> None:
    """One vectorized kernel pass over ``present`` (indices into
    ``datas``), writing fingerprints into ``out`` in place."""
    lens = np.array([len(datas[i]) for i in present], dtype=np.int64)
    buf = np.frombuffer(b"".join(datas[i] for i in present), dtype=np.uint8).astype(
        np.int64
    )
    n = len(buf)
    n_win = n - window + 1
    # direct polynomial hash of every length-`window` byte window: 16
    # shifted vectorized multiply-adds (term j uses power B^(window-1-j)).
    # All in-place into three preallocated buffers: fresh temporaries per
    # step would churn ~100 x 8 MB allocations through the allocator and
    # this host faults first-touch pages at ~6 MB/s (see _FP_M note).
    B, M = 257, (1 << 61) - 1
    M64 = np.int64(M)
    acc = np.zeros(n_win, dtype=np.int64)
    tmp = np.empty(n_win, dtype=np.int64)
    hi = np.empty(n_win, dtype=np.int64)
    for j in range(window):
        p = pow(B, window - 1 - j, M)
        seg = buf[j : j + n_win]
        # hi := ((b * p_hi) * 2^32) mod M via 2^61 ≡ 1; all < 2^62
        np.multiply(seg, np.int64(p >> 32), out=tmp)  # < 2^37
        np.right_shift(tmp, np.int64(29), out=hi)
        np.bitwise_and(tmp, np.int64((1 << 29) - 1), out=tmp)
        np.left_shift(tmp, np.int64(32), out=tmp)
        hi += tmp
        np.subtract(hi, M64, out=hi, where=hi >= M64)
        np.multiply(seg, np.int64(p & 0xFFFFFFFF), out=tmp)  # lo < 2^40
        acc += hi
        np.subtract(acc, M64, out=acc, where=acc >= M64)
        acc += tmp
        np.subtract(acc, M64, out=acc, where=acc >= M64)
    # keep only windows fully inside one document
    offsets = np.zeros(len(present), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    counts = lens - window + 1  # >= 1 by padding
    starts = np.repeat(offsets, counts) + _ranges(counts)
    doc_of = np.repeat(np.arange(len(present), dtype=np.int64), counts)
    H = acc[starts]
    # per-doc distinct + k smallest: sort by (doc, hash), drop adjacent
    # duplicates, keep rank-within-doc < keep
    order = np.lexsort((H, doc_of))
    D2, H2 = doc_of[order], H[order]
    first = np.r_[True, (D2[1:] != D2[:-1]) | (H2[1:] != H2[:-1])]
    Du, Hu = D2[first], H2[first]
    grp_start = np.r_[True, Du[1:] != Du[:-1]]
    start_pos = np.flatnonzero(grp_start)
    grp_sizes = np.diff(np.r_[start_pos, len(Du)])
    rank = np.arange(len(Du)) - np.repeat(start_pos, grp_sizes)
    kmask = rank < keep
    Dk, Hk = Du[kmask], Hu[kmask]  # already int64, values < 2^61
    ks_start = np.flatnonzero(np.r_[True, Dk[1:] != Dk[:-1]])
    ks_end = np.r_[ks_start[1:], len(Dk)]
    for gi, (a, b) in enumerate(zip(ks_start, ks_end)):
        out[present[Dk[a]]] = Hk[a:b].tolist()


def _ranges(counts: np.ndarray) -> np.ndarray:
    """concatenate(arange(c) for c in counts) without a Python loop."""
    total = int(counts.sum())
    ends = np.cumsum(counts)
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    out[ends[:-1]] = 1 - counts[:-1]
    return np.cumsum(out)


def fingerprint_udf(window: int = 16, keep: int = 4):
    from pyspark.sql.types import ArrayType

    @pandas_udf(ArrayType(LongType()))
    def _fp(s: pd.Series) -> pd.Series:
        return pd.Series(fingerprint_batch(s.tolist(), window, keep), index=s.index)

    return _fp
