"""Deduplication operators for training-data pipelines.

All candidate generation is JVM-side (split / transform / md5 / agg
stay in codegen; the portable 56-bit md5 hash keeps every step
reproducible in the DuckDB oracle). Only SimHash drops to an Arrow UDF.

Scale notes:
- exact_dedup: one hash-agg shuffle on a 56-bit fingerprint; at 10^12
  docs this is the classic map-side-combine agg — no skew (hashes are
  uniform).
- minhash_lsh: signatures are per-doc aggregates (shuffle on doc_id is
  avoided — shingles explode and re-aggregate by doc_id with partial
  aggregation); banding joins docs on band-hash equality, the standard
  sub-quadratic near-dup path; band buckets are power-law (boilerplate
  text) -> pair generation caps bucket size (cap param) exactly like
  production dedup pipelines do, and logs nothing silently (returns
  bucket sizes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mundipy_spark.functions import text as tx

# deterministic affine hash constants. Overflow discipline (ANSI mode is
# on in Spark 4): the base hash is reduced mod P (~2^30) before the
# affine step, and every multiplier stays < 2^31, so h*a + b < 2^62
# never overflows int64 in either engine.
HASH_P = 1_000_000_007
_HASH_AB = [
    (824_633_720, 40503),
    (746_822_519, 326_648_991),
    (326_648_991, 668_265_263),
    (374_761_393, 265_443_576),
    (1_103_515_245, 12345),
    (69069, 362437),
    (1_664_525, 1_013_904_223),
    (22_695_477, 1),
    (134_775_813, 1),
    (214_013, 2_531_011),
    (16807, 0),
    (48271, 0),
    (69621, 0),
    (40692, 3791),
    (10007, 10009),
    (104_729, 7919),
]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact normalized-text
    fingerprint. Returns (id, fingerprint, dup_count)."""
    fp = tx.fingerprint_expr(F.col(text_col))
    return (
        df.withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("dup_count"),
        )
        .select(id_col, "fingerprint", "dup_count")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature columns mh0..mh{n-1}, entirely JVM-side:
    shingle -> md5 56-bit int -> n affine permutations -> min per doc.

    One explode + one hash-agg; partial aggregation means the shuffle
    carries only (doc_id, n running minima), not the shingles.
    """
    assert n_hashes <= len(_HASH_AB)
    # materialize the md5 base hash ONCE per shingle in a projection:
    # referencing it inside the n aggregate expressions would re-evaluate
    # the md5 n times per row (no CSE across agg expressions)
    sh = df.select(
        F.col(id_col),
        F.explode(tx.shingles_expr(F.col(text_col), shingle_k)).alias("shingle"),
    ).select(
        id_col, (tx.md5_int_expr(F.col("shingle")) % F.lit(HASH_P)).alias("_h")
    )
    aggs = []
    for i, (a, b) in enumerate(_HASH_AB[:n_hashes]):
        aggs.append(
            F.min((F.col("_h") * F.lit(a) + F.lit(b)) % F.lit(HASH_P)).alias(f"mh{i}")
        )
    return sh.groupBy(id_col).agg(*aggs)


def minhash_sql(
    n_hashes: int = 16, shingle_k: int = 3, table: str = "documents",
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin of minhash_signatures."""
    h = f"({tx.md5_int_sql('shingle')} % {HASH_P})"
    mins = ", ".join(
        f"min(({h} * {a} + {b}) % {HASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(_HASH_AB[:n_hashes])
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, regexp_split_to_array(trim({text_col}), '[\\s\\x0b]+') AS t
  FROM {table}
), sh AS (
  SELECT {id_col},
         array_to_string(t[i : i + {shingle_k - 1}], ' ') AS shingle
  FROM toks, UNNEST(range(1, greatest(len(t) - {shingle_k - 1}, 1) + 1)) AS u(i)
)
SELECT {id_col}, {mins} FROM sh GROUP BY {id_col}
"""


def lsh_jaccard_pairs_sql(
    n_hashes: int = 16,
    bands: int = 4,
    bucket_cap: int = 200,
    shingle_k: int = 3,
    threshold: float = 0.7,
    table: str = "documents",
) -> str:
    """DuckDB oracle twin of the FULL LSH pipeline —
    minhash_signatures -> lsh_candidate_pairs -> jaccard_ngram_pairs —
    banding and bucket-cap included. An all-pairs jaccard oracle is NOT
    equivalent: LSH examines only band-colliding pairs (a mid-range
    pair collides with probability 1-(1-j^rows)^bands) and drops
    boilerplate buckets larger than bucket_cap, both by design; the
    twin must mirror both or any corpus containing such a pair breaks
    the value-exact compare on intended behavior. Band equality is on
    the minhash value tuple, which equals the Spark side's
    md5(concat_ws('_', values)) bucket key exactly (decimal strings
    joined by '_' are injective)."""
    if n_hashes % bands != 0:
        raise ValueError("lsh_jaccard_pairs_sql: bands must divide n_hashes")
    rows = n_hashes // bands
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {hs} FROM sigs".format(
            b=b,
            hs=", ".join(f"mh{b * rows + r} AS h{r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    hcols = ", ".join(f"h{r}" for r in range(rows))
    eq = " AND ".join(f"x.h{r} = y.h{r}" for r in range(rows))
    k1 = shingle_k - 1
    return f"""
WITH sigs AS ({minhash_sql(n_hashes, shingle_k, table=table)}),
bands AS (
  {band_selects}
), kept AS (
  SELECT * FROM (
    SELECT doc_id, band, {hcols},
           count(*) OVER (PARTITION BY band, {hcols}) AS bucket_n
    FROM bands
  ) WHERE bucket_n <= {bucket_cap}
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM kept x JOIN kept y ON x.band = y.band AND {eq} AND x.doc_id < y.doc_id
), toksj AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[\\s\\x0b]+') AS t FROM {table}
), shj AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[i : i + {k1}], ' ') AS shingle
  FROM toksj, UNNEST(range(1, greatest(len(t) - {k1}, 1) + 1)) AS u(i)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM shj GROUP BY doc_id
), inter AS (
  SELECT c.a, c.b, count(*) AS ninter
  FROM cand c
  JOIN shj x ON x.doc_id = c.a
  JOIN shj y ON y.doc_id = c.b AND y.shingle = x.shingle
  GROUP BY 1, 2
)
SELECT i.a, i.b,
       CAST(round(CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter), 6) AS DOUBLE) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
WHERE CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter) >= {threshold}
"""


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    bucket_cap: int = 200,
) -> DataFrame:
    """Band the signatures and emit candidate near-dup pairs (a < b).

    Each band hashes rows/band minhash values together; docs sharing a
    band bucket become candidates. Buckets larger than bucket_cap are
    dropped (boilerplate explosion guard) — the count of dropped buckets
    is observable via lsh_bucket_stats, not silent.
    """
    if n_hashes % bands != 0:
        raise ValueError(
            f"lsh_candidate_pairs: bands={bands} must divide "
            f"n_hashes={n_hashes} (a remainder would silently drop "
            "minhash columns from the banding)"
        )
    rows = n_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("_", *cols)).alias("bkey"))
        )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "bb.band", "bb.bkey")
    sized = banded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "bkey"))
    ).filter(F.col("bucket_n") <= bucket_cap)
    a = sized.select(F.col(id_col).alias("a"), "band", "bkey")
    b = sized.select(F.col(id_col).alias("b"), "band", "bkey")
    return (
        a.join(b, on=["band", "bkey"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_ngram_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs (the refine
    stage after LSH; same filter-then-refine shape as the spatial join)."""
    sh = df.select(
        F.col(id_col),
        F.array_distinct(tx.shingles_expr(F.col(text_col), shingle_k)).alias("sh"),
    )
    a = sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    j = (
        pairs.join(a, "a").join(b, "b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return j


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bucket_cap: int = 200,
    counters=None,
) -> DataFrame:
    """SimHash near-dup pairs: 56-bit portable signature, block banding
    with n_blocks = max_hamming + 1 (pigeonhole: a pair within the
    hamming budget must agree on at least one whole block), exact
    hamming refine via bit_count. max_hamming <= 7 retains the exact
    pigeonhole guarantee (8 blocks of 7 bits); larger budgets are
    clamped to 8 blocks and degrade to approximate recall.

    bucket_cap drops block buckets larger than cap before the self-join
    — a boilerplate-heavy corpus (many identical signatures) would
    otherwise make one bucket quadratic; same guard as
    lsh_candidate_pairs."""
    n_bits = tx.SIMHASH_BITS
    n_blocks = min(max(max_hamming + 1, 2), 8)
    widths = [
        n_bits // n_blocks + (1 if i < n_bits % n_blocks else 0)
        for i in range(n_blocks)
    ]
    sim = tx.simhash56 if counters is None else tx.simhash56_counted(counters)
    sig = df.select(F.col(id_col), sim(F.col(text_col)).alias("sig"))
    blocks = []
    off = 0
    for i, w in enumerate(widths):
        blocks.append(
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("sig"), off).bitwiseAND(F.lit((1 << w) - 1)).alias("bval"),
            )
        )
        off += w
    banded = sig.select(id_col, "sig", F.explode(F.array(*blocks)).alias("b")).select(
        id_col, "sig", "b.blk", "b.bval"
    )
    from pyspark.sql import Window as W

    banded = banded.withColumn(
        "bucket_n", F.count("*").over(W.partitionBy("blk", "bval"))
    ).filter(F.col("bucket_n") <= bucket_cap)
    a = banded.select(F.col(id_col).alias("a"), F.col("sig").alias("sig_a"), "blk", "bval")
    b = banded.select(F.col(id_col).alias("b"), F.col("sig").alias("sig_b"), "blk", "bval")
    return (
        a.join(b, ["blk", "bval"])
        .filter(F.col("a") < F.col("b"))
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
    )


def simhash_pairs_sql(
    max_hamming: int = 7,
    bucket_cap: int = 200,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin of simhash_dedup (same signature, same
    banding, same bucket cap)."""
    n_bits = tx.SIMHASH_BITS
    n_blocks = min(max(max_hamming + 1, 2), 8)
    widths = [
        n_bits // n_blocks + (1 if i < n_bits % n_blocks else 0)
        for i in range(n_blocks)
    ]
    block_rows = []
    off = 0
    for i, w in enumerate(widths):
        block_rows.append(
            f"SELECT {id_col}, sig, {i} AS blk, (sig >> {off}) & {(1 << w) - 1} AS bval FROM sig"
        )
        off += w
    blocks_union = "\nUNION ALL\n".join(block_rows)
    return f"""
WITH {tx.simhash_sig_sql(table, text_col, id_col).strip()},
blocks AS (
{blocks_union}
), capped AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY blk, bval) AS bucket_n FROM blocks
  ) WHERE bucket_n <= {bucket_cap}
)
SELECT DISTINCT x.{id_col} AS a, y.{id_col} AS b,
       bit_count(xor(x.sig, y.sig)) AS hamming
FROM capped x JOIN capped y ON x.blk = y.blk AND x.bval = y.bval
WHERE x.{id_col} < y.{id_col}
  AND bit_count(xor(x.sig, y.sig)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# Incremental dedup against a corpus snapshot (Bloom prefilter + exact
# anti-join confirm)
# ---------------------------------------------------------------------------

def build_bloom56(df: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 4) -> bytes:
    """Distributed Bloom filter over a 56-bit integer column.

    Each partition builds its own m_bits/8-byte bitmap in one numpy
    pass (mapInPandas); the driver ORs the per-batch bitmaps. The
    collect is O(n_batches * m_bits/8) bytes — independent of row
    count, so at 10^12 snapshot rows the driver still receives only
    bitmaps (on a real cluster you would treeAggregate the OR; the OR
    is associative so the plan is identical).

    Hash family: the same ANSI-safe affine permutations as MinHash
    ((h % P) * a + b) % P % m — h % P < 2^30 and a < 2^31 keep every
    product below 2^62 (no int64 overflow).
    """
    ab = _HASH_AB[:k]
    nbytes = m_bits // 8

    def _bitmaps(it):
        for pdf in it:
            arr = np.zeros(nbytes, dtype=np.uint8)
            h = pdf[col].to_numpy(dtype=np.int64) % HASH_P
            for a, b in ab:
                pos = (h * a + b) % HASH_P % m_bits
                np.bitwise_or.at(arr, pos // 8, (1 << (pos % 8)).astype(np.uint8))
            yield pd.DataFrame({"bitmap": [arr.tobytes()]})

    parts = df.select(col).mapInPandas(_bitmaps, schema="bitmap binary").collect()
    acc = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        acc |= np.frombuffer(row.bitmap, dtype=np.uint8)
    return acc.tobytes()


def bloom_might_contain(spark, bloom: bytes, m_bits: int = 1 << 20, k: int = 4):
    """Returns a pandas-UDF Column factory: col -> boolean 'possibly in
    the snapshot'. False is a GUARANTEE of absence (no false
    negatives); True may be a false positive — callers must confirm
    exactly. The bitmap ships to executors once via a Spark broadcast."""
    from pyspark.sql import types as T

    bc = spark.sparkContext.broadcast(bloom)
    ab = _HASH_AB[:k]

    @F.pandas_udf(T.BooleanType())
    def _mc(col: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        h = col.to_numpy(dtype=np.int64) % HASH_P
        hit = np.ones(len(h), dtype=bool)
        for a, b in ab:
            pos = (h * a + b) % HASH_P % m_bits
            hit &= (arr[pos // 8] >> (pos % 8) & 1).astype(bool)
        return pd.Series(hit)

    return _mc


def incremental_dedup(
    new_df: DataFrame,
    snapshot_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Docs in new_df whose normalized-text fingerprint does NOT occur
    in snapshot_df — the incremental-crawl dedup pass.

    Scale shape: the snapshot (10^12 rows) is reduced to an m-bit
    Bloom bitmap ONCE; the new batch is filtered map-side — bloom-
    negative rows are definitely new and never enter a join, only
    bloom-positive rows (true dups + ~(1-e^-kn/m)^k false positives)
    reach the exact left_anti join against the snapshot fingerprints.
    Result is VALUE-EXACT (the anti-join removes Bloom false
    positives), so the DuckDB oracle is a plain NOT EXISTS.
    """
    spark = new_df.sparkSession
    fp = tx.fingerprint_expr(F.col(text_col))
    snap_fp = snapshot_df.select(fp.alias("fingerprint"))
    new_fp = new_df.withColumn("fingerprint", fp)

    bloom = build_bloom56(snap_fp, "fingerprint", m_bits=m_bits, k=k)
    mc = bloom_might_contain(spark, bloom, m_bits=m_bits, k=k)
    flagged = new_fp.withColumn("_maybe_dup", mc(F.col("fingerprint")))

    definite_new = flagged.filter(~F.col("_maybe_dup")).drop("_maybe_dup")
    survivors = (
        flagged.filter(F.col("_maybe_dup"))
        .drop("_maybe_dup")
        .join(snap_fp, on="fingerprint", how="left_anti")
    )
    return definite_new.unionByName(survivors)
