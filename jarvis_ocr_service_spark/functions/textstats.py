"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything except the rolling hash is pure Column expressions (JVM-side,
whole-stage codegen, SQL-oracle-checkable). The rolling hash is a
vectorized pandas UDF (bit arithmetic over codepoints isn't worth forcing
into SQL).

Physical shape note: interpreted higher-order expressions get NO common-
subexpression elimination, so a frame computing lang-id + quality + token
count by inlining ``split(trim(lower(text)))`` into every stopword counter
re-splits the text ~12x per row. ``with_text_stats`` therefore stages the
token arrays ONCE as real columns (Catalyst keeps non-cheap aliases
staged — CollapseProject only inlines cheap/single-use expressions) and
every downstream counter reads the staged array. Same semantics, measured
multiple-x faster on wide documents.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tiny per-language stopword marker sets (n-gram-heuristic language ID:
# count language-marker tokens, majority wins). Deterministic, documented,
# and identical in the DuckDB oracle.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "es": ["el", "la", "los", "de", "que", "es", "un", "una"],
    "it": ["il", "la", "che", "di", "un", "una", "per", "non"],
}
LANGS = sorted(STOPWORDS)  # deterministic tie order: de,en,es,fr,it


def tokens_col(col):
    """Whitespace tokens (empty text -> empty array, not [''])."""
    t = F.trim(F.coalesce(col, F.lit("")))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count_col(col):
    return F.size(tokens_col(col)).cast("long")


def bpe_ish_token_count_col(col):
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punct boundaries (a cheap BPE-shaped proxy), counted with
    one regexp pass."""
    t = F.coalesce(col, F.lit(""))
    pieces = F.regexp_extract_all(t, F.lit(r"[^\W\d_]+|\d+|[^\w\s]"), 0)
    return F.size(pieces).cast("long")


def stopword_hits_from_toks(ltoks, lang: str):
    """Count of lowered tokens that are stopword markers for ``lang``.
    ``ltoks`` must be the already-lowered token array column."""
    markers = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(ltoks, lambda tk: F.array_contains(markers, tk))).cast(
        "long"
    )


def stopword_hits_col(col, lang: str):
    """Count of tokens that are stopword markers for ``lang``."""
    return stopword_hits_from_toks(tokens_col(F.lower(col)), lang)


def spaced_lower_col(col):
    """' ' || single-space-normalized lowered text || ' ' — the staging
    column for the native stopword counters (see below)."""
    return F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.trim(F.coalesce(col, F.lit("")))), r"\s+", " "),
        F.lit(" "),
    )


def stopword_hits_from_spaced(spaced, lang: str):
    """Marker-token count via a native ``regexp_count`` over the spaced
    form — PROVABLY equal to the array-filter form (every token of
    split(trim(s), '\\s+') appears in the spaced string delimited by
    single spaces, and the lookarounds are zero-width so adjacent markers
    all count), but it stays inside whole-stage codegen. The array-filter
    form is an interpreted higher-order lambda: ~one interpreted eval per
    token per language — measured ~45k evals (tens of ms) per 50KB
    document, the dominant cost of the prepare pipeline's quality gate.
    Equality is property-pinned by tests/test_textstats.py."""
    pat = "(?<= )(" + "|".join(STOPWORDS[lang]) + ")(?= )"
    return F.regexp_count(spaced, F.lit(pat)).cast("long")


def lang_id_from_hits(hits_by_lang):
    """Argmax of per-language hit columns ('und' when no marker appears).
    Deterministic ties: LANGS order. ``hits_by_lang`` maps lang -> Column."""
    best_lang = F.lit("und")
    best_hits = F.lit(0).cast("long")
    for lang in LANGS:
        hits = hits_by_lang[lang]
        improved = hits > best_hits
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(improved, hits).otherwise(best_hits)
    return best_lang


def lang_id_col(col):
    """Heuristic language ID from a raw text column. NB: inlines one token
    split per language — inside a frame computing several stats, use
    ``with_text_stats`` so the split is staged once."""
    return lang_id_from_hits(
        {lang: stopword_hits_col(col, lang) for lang in LANGS}
    )


def _quality_from_parts(t, n_tokens, stop_hits_total):
    """Quality score given the staged parts. Arithmetic order is pinned —
    the DuckDB oracle mirrors it exactly; token/hit counts are integers so
    staging them cannot change the float result."""
    n = F.length(t)
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    alpha = F.length(F.regexp_replace(t, r"[\W\d_]+", "")).cast("double") / safe_n
    punct = F.length(F.regexp_replace(t, r"[\w\s]+", "")).cast("double") / safe_n
    toks = n_tokens.cast("double")
    tok_signal = F.least(F.lit(1.0), toks / 100.0)
    stop_signal = F.least(F.lit(1.0), stop_hits_total.cast("double") / 10.0)
    score = (
        0.4 * alpha + 0.3 * tok_signal + 0.2 * (1.0 - punct) + 0.1 * stop_signal
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), score))
    )


def quality_score_col(col):
    """Deterministic quality score in [0,1]:
    0.4*alpha_ratio + 0.3*min(1, tokens/100) + 0.2*(1-punct_ratio)
    + 0.1*stopword_signal. Standalone column form — inside a frame use
    ``with_text_stats`` (stages the token split once)."""
    t = F.coalesce(col, F.lit(""))
    stop_total = sum(stopword_hits_col(t, lang) for lang in LANGS)
    return _quality_from_parts(t, token_count_col(t), stop_total)


def fingerprint_md5_col(col):
    """Content fingerprint: md5 of the *normalized* text (so formatting
    noise doesn't split identical documents)."""
    from jarvis_ocr_service_spark.operators.textops import normalize_text_col

    return F.md5(F.encode(normalize_text_col(col), "UTF-8"))


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "winnow_fp",
    k: int = 8,
    w: int = 8,
    max_chars: int = 2048,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken — the
    MOSS algorithm): hash every character k-gram, slide a w-wide window,
    keep each window's minimum hash; the distinct minima are the
    fingerprint set (array<string> in ``out_col``). Guarantee: any shared
    substring of length >= k+w-1 contributes at least one shared
    fingerprint — substring-level copy detection, where md5-of-whole-text
    only catches full-document dups.

    Implementation: Arrow-batched numpy. Per batch, every k-gram of every
    document is collected once, deduplicated with an insertion-order dict
    (crawl corpora repeat substrings heavily, so the md5 cost is paid per
    *distinct* gram, not per occurrence), the distinct grams are md5'd
    and ranked by digest order, and each document's window minima come
    from a fully vectorized ``sliding_window_view(...).min(axis=1)`` over
    its integer rank sequence — integer rank order == digest order == hex
    string order, so the minima are exactly the lexicographic-min hex
    hashes. A pure-Column form exists on paper (transform + slice +
    array_min) but interpreted higher-order lambdas cost ~0.4 ms *per
    window element* — measured 218s vs ~2s for 500 docs x ~1000 grams —
    so this is one of the places where a vectorized UDF beats "JVM-side".
    Hashes are md5 hex over the UTF-8 bytes (min by string order —
    portable; the DuckDB oracle mirrors it exactly). Fingerprints are
    sorted + distinct (deterministic array order); cost is bounded by
    ``max_chars`` like the validator.
    """
    import hashlib

    import numpy as np

    from pyspark.sql import types as T

    def batch(s: pd.Series) -> pd.Series:
        texts = [(t or "")[:max_chars] for t in s]
        # Collect every k-gram (and each too-short text, hashed whole —
        # same fallback as the reference scalar form) into one array.
        doc_grams: list = []
        for t in texts:
            n = len(t)
            if n < k:
                doc_grams.append([t])
            else:
                doc_grams.append([t[i : i + k] for i in range(n - k + 1)])
        flat = [g for grams in doc_grams for g in grams]
        if not flat:
            return pd.Series([[] for _ in texts])
        # Dict-based dedup (insertion-order ids) — crawl corpora repeat
        # substrings heavily (measured 14x on the test corpus), so md5 is
        # paid per distinct gram. A dict beats np.unique here: object-
        # string sorting costs more than the hashing it saves.
        index: dict = {}
        inverse = np.fromiter(
            (index.setdefault(g, len(index)) for g in flat),
            dtype=np.int64,
            count=len(flat),
        )
        uniq = list(index)
        dig_list = [hashlib.md5(g.encode()).digest() for g in uniq]
        # rank[i] = position of uniq[i]'s digest in digest sort order, so
        # comparing ranks == comparing digests == comparing hex strings.
        # (Two big-endian uint64 halves lexsorted == 16-byte memcmp order;
        # NOT numpy "S16", whose retrieval strips trailing NUL bytes.)
        keys = np.frombuffer(b"".join(dig_list), dtype=">u8").reshape(-1, 2)
        order = np.lexsort((keys[:, 1], keys[:, 0]))
        rank = np.empty(len(uniq), dtype=np.int64)
        rank[order] = np.arange(len(uniq))
        hex_by_rank = [dig_list[int(j)].hex() for j in order]

        out = []
        pos = 0
        for grams in doc_grams:
            m = len(grams)
            r = rank[inverse[pos : pos + m]]
            pos += m
            if m - w + 1 < 1:
                out.append([hex_by_rank[int(r.min())]])
                continue
            mins = np.unique(
                np.lib.stride_tricks.sliding_window_view(r, w).min(axis=1)
            )
            out.append([hex_by_rank[int(j)] for j in mins])
        return pd.Series(out)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def winnow(series: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in series:
            yield batch(s)

    return df.withColumn(out_col, winnow(F.col(text_col)))


_MOD = (1 << 61) - 1
_BASE = 257

# Growing cache of BASE^k mod MOD (uint64). Extended on demand; pandas-UDF
# workers are single-threaded per process so no locking is needed.
_POW_CACHE = np.array([1], dtype=np.uint64)


def _powers(n: int) -> np.ndarray:
    """First ``n`` powers of _BASE mod _MOD as uint64 (index k = BASE^k)."""
    global _POW_CACHE
    if len(_POW_CACHE) < n:
        ext = [int(_POW_CACHE[-1])]
        while len(_POW_CACHE) + len(ext) - 1 < n:
            ext.append(ext[-1] * _BASE % _MOD)
        _POW_CACHE = np.concatenate(
            [_POW_CACHE, np.array(ext[1:], dtype=np.uint64)]
        )
    return _POW_CACHE


_M_U = np.uint64(_MOD)


def _fold61(x: np.ndarray) -> np.ndarray:
    """Reduce x (< 2^64) mod the Mersenne prime 2^61-1, exactly."""
    x = (x & _M_U) + (x >> np.uint64(61))  # < 2^61 + 8
    return np.where(x >= _M_U, x - _M_U, x)


def _rolling_hash_one_numpy(t: str) -> int:
    """Exact numpy form of the Horner loop: h = sum(cp[i] * B^(n-1-i)) mod M.

    Per-character term cp*p is an 82-bit product, done with a 31-bit split
    of the power (cp < 2^21): cp*p = cp*p_hi*2^31 + cp*p_lo, and
    y*2^31 mod M = ((y<<31) & M) + (y>>30) because 2^61 = 1 (mod M) — the
    uint64 left-shift's lost high bits are exactly the (y>>30) term.
    Term sums are folded every 8 elements (8*(2^61-1) < 2^64, no overflow).
    """
    n = len(t)
    cp = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    p = _powers(n)[n - 1 :: -1]  # B^(n-1) ... B^0, aligned with cp
    p_hi = p >> np.uint64(31)  # < 2^30
    p_lo = p & np.uint64(0x7FFFFFFF)  # < 2^31
    y = cp * p_hi  # < 2^51
    term = ((y << np.uint64(31)) & _M_U) + (y >> np.uint64(30)) + cp * p_lo
    s = _fold61(term)  # exact per-char terms, < 2^61 - 1
    while s.size > 1:
        pad = (-s.size) % 8
        if pad:
            s = np.concatenate([s, np.zeros(pad, dtype=np.uint64)])
        s = _fold61(s.reshape(-1, 8).sum(axis=1))
    return int(s[0])


def _rolling_hash_one(t: str) -> int:
    """Shared scalar semantics (pure Python below ~64 chars where numpy
    call overhead dominates; identical results — property-tested)."""
    if len(t) < 64:
        h = 0
        for ch in t:
            h = (h * _BASE + ord(ch)) % _MOD
        return h
    return _rolling_hash_one_numpy(t)


@F.pandas_udf(T.LongType())
def rolling_hash64(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Polynomial rolling hash (base 257 mod 2^61-1) over codepoints —
    an order-sensitive fingerprint (md5 is order-sensitive too, but the
    rolling form supports incremental/windowed variants). Arrow-batched;
    per-doc work is vectorized numpy (precomputed base powers + Mersenne
    folding — no per-character Python on long documents)."""
    for s in texts:
        yield s.fillna("").map(_rolling_hash_one)


ALL_STATS = ("n_tokens", "n_subtokens", "n_bytes", "lang_guess", "quality",
             "fingerprint")


def with_text_stats(
    df: DataFrame,
    text_col: str = "text",
    stats: Sequence[str] = ALL_STATS,
) -> DataFrame:
    """Append the requested stat columns with the token splits staged ONCE
    as real columns (see module docstring). Byte/value-identical to the
    standalone ``*_col`` forms — pinned by tests and the DuckDB oracles."""
    c = F.col(text_col)
    need_toks = "n_tokens" in stats or "quality" in stats
    need_ltoks = "lang_guess" in stats or "quality" in stats
    tmp = df.withColumn("_ts_t", F.coalesce(c, F.lit("")))
    drop = ["_ts_t"]
    if need_toks:
        tmp = tmp.withColumn("_ts_ntok", F.size(tokens_col(F.col("_ts_t"))).cast("long"))
        drop.append("_ts_ntok")
    if need_ltoks:
        # native regexp_count over the spaced form — value-identical to
        # the array-filter form (stopword_hits_from_spaced docstring) but
        # no interpreted lambda per token
        tmp = tmp.withColumn("_ts_sp", spaced_lower_col(F.col("_ts_t")))
        drop.append("_ts_sp")
        for lang in LANGS:
            tmp = tmp.withColumn(
                f"_ts_h_{lang}",
                stopword_hits_from_spaced(F.col("_ts_sp"), lang),
            )
            drop.append(f"_ts_h_{lang}")
    t = F.col("_ts_t")
    hits = {lang: F.col(f"_ts_h_{lang}") for lang in LANGS}
    builders = {
        "n_tokens": lambda: F.col("_ts_ntok"),
        "n_subtokens": lambda: bpe_ish_token_count_col(t),
        # raw column (not the coalesced _ts_t): null text -> null bytes,
        # matching the standalone form
        "n_bytes": lambda: F.octet_length(c).cast("long"),
        "lang_guess": lambda: lang_id_from_hits(hits),
        # integer sum of integer hit counts — order-independent, exact,
        # identical to the inline `sum(stopword_hits_col(...))` form
        "quality": lambda: _quality_from_parts(
            t, F.col("_ts_ntok"), sum(hits[lang] for lang in LANGS)
        ),
        "fingerprint": lambda: fingerprint_md5_col(t),
    }
    for name in stats:
        tmp = tmp.withColumn(name, builders[name]())
    return tmp.drop(*drop)


def text_stats(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """One-pass per-document stats frame (all JVM-side, splits staged once)."""
    out = with_text_stats(df.select(key_col, text_col), text_col)
    return out.select(key_col, *ALL_STATS)
