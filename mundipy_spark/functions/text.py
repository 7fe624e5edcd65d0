"""Text-analysis functions for the training-data pipeline.

Everything that can be column arithmetic IS column arithmetic (split,
regexp, md5) so it scales JVM-side; only language-ID's n-gram scoring
drops to an Arrow pandas UDF. Each function has a deterministic
definition the DuckDB oracle can reproduce in SQL (see __spark_entry__).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# JVM-side expressions
# ---------------------------------------------------------------------------


def token_count_expr(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def token_count_sql(text: str) -> str:
    return (
        f"CASE WHEN length(trim({text})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({text}), '[\\s\\x0b]+')) END"
    )


def bpe_token_count_expr(text: Column) -> Column:
    """BPE-ish subword-count estimate, all JVM regex: alpha runs
    contribute ceil(len/4) subwords (the empirical ~4-chars-per-token
    density of English BPE vocabularies), digits and punctuation chars
    count one token each (BPE splits numbers and symbols fine). The
    estimator is deterministic and SQL-reproducible — the curation role
    of a token budget without shipping a tokenizer model."""
    pieces = F.regexp_extract_all(text, F.lit(r"[A-Za-z]+"), 0)
    alpha = F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, p: acc + F.ceil(F.length(p) / F.lit(4.0)).cast("long"),
    )
    digits = F.regexp_count(text, F.lit(r"[0-9]"))
    punct = F.regexp_count(text, F.lit(r"[^\sA-Za-z0-9]"))
    return (alpha + digits + punct).cast("long")


def bpe_token_count_sql(text: str) -> str:
    # outer CAST matters: list_sum over a BIGINT list yields HUGEINT,
    # which pandas materializes as float64 — the value-hash gate then
    # sees '64.0' vs Spark's '64'
    return (
        "CAST(coalesce(list_sum(list_transform("
        f"regexp_extract_all({text}, '[A-Za-z]+'), "
        "p -> CAST(ceil(length(p) / 4.0) AS BIGINT))), 0) "
        f"+ length(regexp_replace({text}, '[^0-9]', '', 'g')) "
        f"+ length(regexp_replace({text}, '[\\sA-Za-z0-9]', '', 'g')) "
        "AS BIGINT)"
    )


def md5_int_expr(s: Column) -> Column:
    """First 14 hex chars of md5 as a bigint — a portable 56-bit hash both
    Spark (`conv`) and DuckDB (`CAST('0x'||... AS BIGINT)`) compute
    identically; the shared primitive for MinHash/fingerprints."""
    return F.conv(F.substring(F.md5(s), 1, 14), 16, 10).cast("long")


def md5_int_sql(s: str) -> str:
    return f"CAST(('0x' || substr(md5({s}), 1, 14)) AS BIGINT)"


def quality_score_expr(text: Column) -> Column:
    """Heuristic quality score in [0,1]: length band + alpha ratio +
    mean-word-length band. Deterministic, SQL-reproducible."""
    n = F.length(text)
    toks = token_count_expr(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n > 0, alpha.cast("double") / n).otherwise(F.lit(0.0))
    mean_wl = F.when(toks > 0, n.cast("double") / toks).otherwise(F.lit(0.0))
    len_band = F.when((n >= 100) & (n <= 20000), 1.0).when(n > 0, 0.5).otherwise(0.0)
    wl_band = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), 1.0).otherwise(0.5)
    return (len_band + alpha_ratio + wl_band) / 3.0


def quality_score_sql(text: str) -> str:
    n = f"length({text})"
    toks = token_count_sql(text)
    alpha = f"length(regexp_replace({text}, '[^A-Za-z]', '', 'g'))"
    alpha_ratio = f"(CASE WHEN {n} > 0 THEN CAST({alpha} AS DOUBLE) / {n} ELSE 0.0 END)"
    mean_wl = f"(CASE WHEN {toks} > 0 THEN CAST({n} AS DOUBLE) / ({toks}) ELSE 0.0 END)"
    len_band = f"(CASE WHEN {n} >= 100 AND {n} <= 20000 THEN 1.0 WHEN {n} > 0 THEN 0.5 ELSE 0.0 END)"
    wl_band = f"(CASE WHEN {mean_wl} >= 3.0 AND {mean_wl} <= 12.0 THEN 1.0 ELSE 0.5 END)"
    return f"(({len_band} + {alpha_ratio} + {wl_band}) / 3.0)"


def fingerprint_expr(text: Column) -> Column:
    """Document fingerprint: 56-bit hash of whitespace-normalized text."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return md5_int_expr(norm)


def fingerprint_sql(text: str) -> str:
    norm = f"regexp_replace(lower(trim({text})), '[\\s\\x0b]+', ' ', 'g')"
    return md5_int_sql(norm)


def shingles_expr(text: Column, k: int = 3) -> Column:
    """Word k-shingles as an array<string>, built with JVM array ops
    (split → transform over a sequence of slice windows). Documents
    shorter than k words get their whole text as the single shingle."""
    toks = F.split(F.trim(text), r"\s+")
    nsh = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), nsh - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )


# ---------------------------------------------------------------------------
# language ID (n-gram/stopword heuristic) — the one pandas UDF here
# ---------------------------------------------------------------------------

# tiny per-language marker sets (public common stopwords)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"},
    "fr": {"le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"},
    "es": {"el", "la", "los", "las", "es", "una", "para", "con", "que", "por"},
}


@F.pandas_udf(T.StringType())
def lang_id(text: pd.Series) -> pd.Series:
    """Heuristic language ID: CJK codepoint ratio → zh; else the language
    whose stopword markers hit most tokens; 'und' when nothing hits."""
    out = []
    for t in text:
        if t is None:
            out.append(None)
            continue
        n_cjk = sum(1 for ch in t[:2000] if "一" <= ch <= "鿿")
        if n_cjk > max(4, len(t[:2000]) * 0.05):
            out.append("zh")
            continue
        toks = _ascii_tokens(t)
        if not toks:
            out.append("und")
            continue
        best, best_hits = "und", 0
        for lang, markers in _LANG_MARKERS.items():
            hits = sum(1 for w in toks if w in markers)
            if hits > best_hits:
                best, best_hits = lang, hits
        out.append(best if best_hits > 0 else "und")
    return pd.Series(out)


# ASCII \s == Java regex \s == the twins' RE2 [\s\x0b] — exactly the set
# Spark's F.split(r"\s+") breaks on. Python str.split() splits on ALL
# Unicode whitespace (U+00A0 etc., ubiquitous in scraped HTML), which
# silently diverged the pandas-UDF tokenizers from both the Spark
# column tokenizers and the DuckDB oracles on real web text.
_ASCII_WS_SPLIT = re.compile(r"\s+", re.ASCII).split


def _ascii_tokens(t: str) -> list[str]:
    return [w for w in _ASCII_WS_SPLIT(t.lower()) if w]


# Executor-local token-hash memo (Zipfian vocab: most tokens repeat, so
# steady-state batches hash almost nothing) — the standard PySpark
# module-scope-cache pattern the reference uses via lru_cache
# (mundipy/cache/__init__.py:10).
_TOKEN_HASH_MEMO: dict[str, int] = {}
_TOKEN_HASH_MEMO_LIMIT = 2_000_000

SIMHASH_BITS = 56  # md5[:14] = 56-bit token hash, portable to the oracle


def _token_hash56(w: str) -> int:
    """First 14 hex chars of md5(utf-8 bytes) — byte-identical to
    md5_int_expr / md5_int_sql, so the DuckDB oracle reproduces the
    SimHash signature exactly."""
    import hashlib

    return int(hashlib.md5(w.encode("utf-8")).hexdigest()[:14], 16)


def _simhash_batch(text: pd.Series, counters=None) -> pd.Series:
    """56-bit SimHash over word tokens, vectorized across the whole
    Arrow batch: only NEW unique tokens are hashed (md5 — deterministic,
    portable, stable across workers and reproducible in SQL), bit votes
    are 56 `reduceat` passes over the flat token-hash array, and
    signatures assemble via packbits. No per-token Python in steady
    state (Zipfian vocab: the memo absorbs repeats). counters: optional
    DistCacheCounters reporting memo hits (vocab lookups served) and
    misses (tokens hashed) to the driver."""
    n = len(text)
    out = np.zeros(n, dtype=np.int64)
    tok_lists = [_ascii_tokens(t) if t else [] for t in text]

    batch_vocab = {w for toks in tok_lists for w in toks}
    new = [w for w in batch_vocab if w not in _TOKEN_HASH_MEMO]
    if counters is not None:
        counters.record(len(batch_vocab) - len(new), len(new))
    if new:
        hs = np.fromiter(
            (_token_hash56(w) for w in new), dtype=np.uint64, count=len(new)
        )
        if len(_TOKEN_HASH_MEMO) + len(new) > _TOKEN_HASH_MEMO_LIMIT:
            # eviction must not orphan tokens THIS batch still reads:
            # carry the batch's already-memoized entries across the clear
            keep = {w: _TOKEN_HASH_MEMO[w] for w in batch_vocab if w in _TOKEN_HASH_MEMO}
            _TOKEN_HASH_MEMO.clear()
            _TOKEN_HASH_MEMO.update(keep)
        _TOKEN_HASH_MEMO.update(zip(new, hs))

    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
    nz = np.nonzero(counts)[0]
    if len(nz) == 0:
        return pd.Series(out)
    memo = _TOKEN_HASH_MEMO
    flat = np.fromiter(
        (memo[w] for i in nz for w in tok_lists[i]),
        dtype=np.uint64,
        count=int(counts[nz].sum()),
    )
    cnz = counts[nz]
    offsets = np.zeros(len(nz), dtype=np.int64)
    np.cumsum(cnz[:-1], out=offsets[1:])
    # majority vote per bit: sum(bit) * 2 > count  <=>  sum(2*bit-1) > 0
    setbits = np.zeros((len(nz), 64), dtype=bool)
    for b in range(SIMHASH_BITS):
        s_b = np.add.reduceat((flat >> np.uint64(b)) & np.uint64(1), offsets)
        setbits[:, b] = s_b * 2 > cnz
    sig8 = np.packbits(setbits, axis=1, bitorder="little")
    out[nz] = sig8.view(np.int64).ravel()
    return pd.Series(out)


@F.pandas_udf(T.LongType())
def simhash56(text: pd.Series) -> pd.Series:
    return _simhash_batch(text)


def simhash56_counted(counters):
    """simhash56 with accumulator-backed token-memo observability (K2
    parity role of the reference's cache_info counters,
    cache/__init__.py:139-147): pass a mundipy_spark.cache.
    DistCacheCounters; after an action, counters.cache_info() reports
    aggregate memo hits/misses across all executors."""

    @F.pandas_udf(T.LongType())
    def sim(text: pd.Series) -> pd.Series:
        return _simhash_batch(text, counters)

    return sim


def simhash_sig_sql(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    """DuckDB CTE body reproducing simhash56 exactly: md5[:14] token
    hash, per-bit majority vote, 56-bit signature (0 for empty docs)."""
    votes = ",\n         ".join(
        f"sum((h >> {b}) & 1) AS s{b}" for b in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN 2 * s{b} > n THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
tok AS (
  SELECT {id_col}, unnest(regexp_split_to_array(lower(trim({text_col})), '[\\s\\x0b]+')) AS w
  FROM {table}
), th AS (
  SELECT {id_col}, {md5_int_sql('w')} AS h FROM tok WHERE w <> ''
), votes AS (
  SELECT {id_col}, count(*) AS n,
         {votes}
  FROM th GROUP BY {id_col}
), sig AS (
  SELECT d.{id_col}, coalesce({sig}, 0) AS sig
  FROM {table} d LEFT JOIN votes v USING ({id_col})
)"""


def hamming64_expr(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
