"""Distributed BPE tokenizer training — the vocabulary-learning stage
of a training-data pipeline (Sennrich et al. 2016, public algorithm).
`functions/text.bpe_token_count_expr` estimates token budgets; this
module LEARNS the merge table from the corpus itself, the step every
LLM data pipeline runs before tokenizing.

ENGINE-EXACT and iterative, like operators/pagerank: every step is
integer counting plus binary-collation string comparison, so a DuckDB
twin with the iterations unrolled as CTE stages (`bpe_train_sql`)
reproduces the learned merges bit-for-bit.

Algorithm (classic BPE over a word-frequency vocabulary):
  1. corpus -> (word, freq): ONE shuffle of the corpus, with map-side
     combine (`groupBy(word).count()`). Words split on Java `\\s` —
     the repo-wide tokenizer convention (twins use `[\\s\\x0b]+`).
  2. each word becomes a space-joined symbol sequence: its characters
     plus a trailing end-of-word marker symbol `</w>` (word-final
     merges stay distinct from word-interior ones).
  3. per merge round: count adjacent symbol pairs weighted by word
     freq (ONE partial-agg shuffle over the VOCAB, not the corpus),
     pick argmax with a deterministic tie-break (count desc, pair
     string asc — binary collation in both engines), then rewrite
     every vocab sequence with a greedy left-to-right fold (map-only).

Greedy fold semantics: scanning symbols left to right, a pair merges
and the scan resumes AFTER the merged token ("a a a a a" under merge
(a,a) -> "aa aa a", never "aa a aa"). Implemented as a left fold whose
accumulator is the space-joined output — `F.aggregate` on the Spark
side, `list_reduce` in the twin; the fold equals the greedy scan
because a merged token `a||b` can only re-match as a left element if
`b` were empty, and symbols are never empty.

Scale shape (100 TB corpus, ~1e8 distinct words):
- the corpus is touched ONCE (word count); every merge round operates
  on the distinct-word vocab, orders of magnitude smaller;
- one round = one partial-agg pair-count shuffle on the vocab + a
  1-row driver collect (the argmax) + a map-only rewrite. `n_merges`
  rounds = n small shuffles — the standard distributed-BPE shape;
- vocab lineage is cut every `checkpoint_every` rounds
  (localCheckpoint, the operators/pagerank policy);
- `max_vocab` optionally prunes to the top words by (freq desc, word
  asc) before training — the documented mass-coverage approximation
  production tokenizers use — bounding round cost independent of
  corpus tail size.

Reference role: the reference engine (BuntingLabs/mundipy) has no
tokenizer stage; this extends the §2 webtext suite alongside
operators/lm.py and functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MARKER = "</w>"

#: SQL split pattern matching Java ``\s`` (see ROUND4.md: Java vs RE2
#: whitespace divergence — twins must split identically on real text).
_TWIN_WS = r"[\s\x0b]+"

_MERGE_SCHEMA = T.StructType(
    [
        T.StructField("step", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("pair_freq", T.LongType(), False),
    ]
)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the single corpus-wide shuffle
    of BPE training (map-side combine collapses repeats per task)."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def _initial_vocab(wc: DataFrame) -> DataFrame:
    """(seq, freq): each word as a space-joined character sequence
    plus the end-of-word marker symbol.

    DOTALL `(?s)`: Java's bare `.` skips line terminators
    (\\u0085/\\u2028/\\u2029 are NOT Java `\\s`, so they survive word
    splitting), while the DuckDB twin's RE2 `.` matches them — without
    `(?s)` a word containing U+2028 char-splits differently in the two
    engines and the learned merges diverge (ADVICE r4). `\\n` cannot
    occur inside a word (it IS `\\s`), so with DOTALL both agree."""
    chars = F.trim(F.regexp_replace(F.col("word"), r"(?s)(.)", "$1 "))
    return wc.select(
        F.concat(chars, F.lit(" " + MARKER)).alias("seq"), "freq"
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right merge of adjacent pair (a, b) in every
    sequence — map-only fold; `a`/`b` bind as literal Columns so any
    character content (quotes, regex metachars) is safe."""
    return vocab.select(_fold_col(a, b).alias("seq"), "freq")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the vocab: one partial-agg
    shuffle; the pair key is uniform (no corpus-level skew — hot words
    were already collapsed into single vocab rows with a freq)."""
    syms = F.split(F.col("seq"), " ")
    n = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return (
        vocab.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    max_vocab: int | None = None,
    min_freq: int = 1,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn `n_merges` BPE merges from the corpus; returns the merge
    table (step, left, right, merged, pair_freq) as a DataFrame —
    bounded at n_merges rows, built driver-side from the per-round
    1-row argmax collects (the pagerank/kmeans driver-collect
    discipline: O(rounds), never O(data)).

    Raises ValueError if the vocab runs out of adjacent pairs before
    `n_merges` rounds — the unrolled SQL twin cannot represent an
    early stop, so exhaustion is loud rather than silently divergent.
    """
    spark = docs.sparkSession
    wc = word_counts(docs, text_col)
    if min_freq > 1:
        # the SCALE path for bounding the vocab: a map-side filter, no
        # global order. `max_vocab` (top-N by freq) plans a
        # TakeOrdered whose single reduce task holds N rows — fine for
        # tokenizer-sized N (1e5..1e6), wrong for "most of the vocab";
        # a frequency cutoff bounds the tail at any corpus size.
        wc = wc.filter(F.col("freq") >= min_freq)
    vocab = _initial_vocab(wc)
    if max_vocab is not None:
        vocab = vocab.orderBy(F.desc("freq"), F.asc("seq")).limit(max_vocab)
    vocab = vocab.persist()
    merges: list[tuple] = []
    try:
        for step_i in range(n_merges):
            top = (
                _pair_counts(vocab)
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                raise ValueError(
                    f"vocab exhausted after {step_i} merges "
                    f"(n_merges={n_merges} too large for this corpus)"
                )
            pair, cnt = top[0]["pair"], top[0]["cnt"]
            a, b = pair.split(" ", 1)
            merges.append((step_i, a, b, a + b, int(cnt)))
            nxt = _apply_merge(vocab, a, b)
            if (step_i + 1) % checkpoint_every == 0 and step_i + 1 < n_merges:
                # lineage cut: materializes eagerly, parents safe to drop
                nxt = nxt.localCheckpoint(eager=True)
            else:
                # lazy persist: the next round's argmax job materializes
                # it; until then the ≤checkpoint_every pending folds
                # replay over the last cut — map-only work on the vocab,
                # cheaper than an extra eager pass per round
                nxt = nxt.persist()
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return spark.createDataFrame(merges, schema=_MERGE_SCHEMA)


def bpe_vocab(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    max_vocab: int | None = None,
    min_freq: int = 1,
) -> DataFrame:
    """(seq, freq) vocabulary AFTER applying the learned merges —
    the distinct-word segmentation table used to encode the corpus
    (broadcast-join it against exploded words; the fold runs |V|
    times, never |corpus| times). Merges are learned on the
    min_freq/max_vocab-bounded vocab but applied to the full one."""
    merges = bpe_train(docs, text_col, n_merges, max_vocab, min_freq).collect()
    vocab = _initial_vocab(word_counts(docs, text_col))
    for m in merges:
        vocab = _apply_merge(vocab, m["left"], m["right"])
    return vocab


def bpe_token_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: DataFrame | list,
) -> DataFrame:
    """(id, n_tokens): exact per-doc token counts under a trained
    merge table — the curation-budget application of BPE. Encodes
    DISTINCT words once (vocab-level folds), then broadcast-joins the
    (word -> n_tokens) map against the exploded corpus: one explode +
    broadcast join + one partial-agg shuffle on `id_col`; the fold
    cost is O(|V| * n_merges), independent of corpus size."""
    rows = merges.collect() if isinstance(merges, DataFrame) else merges
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    seqd = words.select("word").distinct().select(
        "word",
        F.concat(
            # (?s): match line-separator chars inside words — see
            # _initial_vocab (ADVICE r4 twin-divergence fix)
            F.trim(F.regexp_replace(F.col("word"), r"(?s)(.)", "$1 ")),
            F.lit(" " + MARKER),
        ).alias("seq"),
    )
    for m in rows:
        seqd = seqd.select(
            "word", _fold_col(m["left"], m["right"]).alias("seq")
        )
    token_map = seqd.select(
        "word", F.size(F.split(F.col("seq"), " ")).alias("n_word_tokens")
    )
    return (
        words.join(F.broadcast(token_map), on="word")
        .groupBy(id_col)
        .agg(F.sum("n_word_tokens").alias("n_tokens"))
    )


def _fold_col(a: str, b: str):
    """The greedy-merge fold of `_apply_merge`, as a Column over the
    current `seq` column (used where extra columns ride along)."""
    la, lb = F.lit(a), F.lit(b)
    merged = F.lit(a + b)

    def step(acc, x):
        hit = (x == lb) & (
            (acc == la) | acc.endswith(F.concat(F.lit(" "), la))
        )
        return (
            F.when(
                hit,
                F.concat(
                    F.substring(acc, 1, F.length(acc) - F.length(la)),
                    merged,
                ),
            )
            .when(acc == "", x)
            .otherwise(F.concat(acc, F.lit(" "), x))
        )

    return F.aggregate(F.split(F.col("seq"), " "), F.lit(""), step)


# --------------------------------------------------------------------
# DuckDB twin: the iterations unrolled as CTE stages (pagerank style).
# --------------------------------------------------------------------


def _round_ctes(n_merges: int, docs_rel: str, text_col: str) -> str:
    """The shared CTE chain: word counts -> char+marker vocab -> per
    round (weighted pair counts, binary-collation argmax, list_reduce
    greedy fold). v{n_merges} is the fully segmented vocab; the word
    rides along so appliers can join it back to the corpus."""
    parts = [
        f"""w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(regexp_split_to_array({text_col}, '{_TWIN_WS}')) AS word
    FROM {docs_rel}
  ) WHERE word <> '' GROUP BY word
), v0 AS (
  SELECT word,
         trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' {MARKER}' AS seq,
         freq
  FROM w0
)"""
    ]
    for i in range(n_merges):
        parts.append(
            f"""p{i} AS (
  SELECT l[i] || ' ' || l[i+1] AS pair, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (
    SELECT l, freq, unnest(range(1, len(l))) AS i
    FROM (SELECT string_split(seq, ' ') AS l, freq FROM v{i})
  ) GROUP BY pair
), m{i} AS (
  SELECT {i} AS step,
         string_split(pair, ' ')[1] AS a,
         string_split(pair, ' ')[2] AS b,
         pair, cnt
  FROM p{i} ORDER BY cnt DESC, pair ASC LIMIT 1
), v{i + 1} AS (
  SELECT v.word, list_reduce(string_split(v.seq, ' '),
    (acc, x) -> CASE
      WHEN x = m.b AND (acc = m.a OR ends_with(acc, ' ' || m.a))
      THEN substring(acc, 1, length(acc) - length(m.a)) || m.a || m.b
      ELSE acc || ' ' || x END) AS seq, v.freq
  FROM v{i} v CROSS JOIN m{i} m
)"""
        )
    return ",\n".join(parts)


def bpe_train_sql(
    n_merges: int = 8,
    docs_rel: str = "documents",
    text_col: str = "text",
) -> str:
    """Unrolled DuckDB twin of `bpe_train`: same word split (Java-\\s
    faithful `[\\s\\x0b]+`), same char+marker init, same weighted pair
    counts, same (cnt desc, pair asc) binary-collation argmax, same
    greedy fold via list_reduce. Value-exact by construction."""
    union = "\nUNION ALL\n".join(
        f"SELECT step, a, b, cnt FROM m{i}" for i in range(n_merges)
    )
    return (
        "WITH "
        + _round_ctes(n_merges, docs_rel, text_col)
        + f""",
all_m AS (
{union}
)
SELECT CAST(step AS INTEGER) AS step, a AS left, b AS right,
       a || b AS merged, cnt AS pair_freq
FROM all_m ORDER BY step
"""
    )


def bpe_token_counts_sql(
    n_merges: int = 8,
    docs_rel: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Unrolled DuckDB twin of train + `bpe_token_counts`: the final
    round's vocab (word -> segmented seq) joins back to the exploded
    corpus, mirroring the Spark broadcast-join apply path end-to-end —
    a divergence anywhere in training OR application breaks it."""
    return (
        "WITH "
        + _round_ctes(n_merges, docs_rel, text_col)
        + f""",
tok AS (
  SELECT word, len(string_split(seq, ' ')) AS n_word_tokens
  FROM v{n_merges}
), corpus AS (
  SELECT {id_col}, unnest(regexp_split_to_array({text_col}, '{_TWIN_WS}')) AS word
  FROM {docs_rel}
)
SELECT c.{id_col}, CAST(sum(t.n_word_tokens) AS BIGINT) AS n_tokens
FROM corpus c JOIN tok t ON t.word = c.word
WHERE c.word <> ''
GROUP BY c.{id_col}
"""
    )
