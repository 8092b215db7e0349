"""Distributed BPE (byte-pair-encoding) vocabulary training — the merge-
learning half of the tokenizer pipeline (``bpe_token_stats`` covers the
pre-tokenizer/counting half).

Algorithm (Sennrich et al., the standard): start from character symbol
sequences, repeatedly find the most frequent adjacent symbol pair and
merge it into a new symbol, N times. The learned merge list IS the
tokenizer vocabulary.

Scale shape — the two decisions that make this Spark-viable at 100 TB:

1. **Train on the word-TYPE table, not the corpus.** One pass aggregates
   the corpus to (word, freq) — after that every iteration touches only
   distinct word types (≈10⁶ rows for a 100 TB corpus, vs 10¹² corpus
   tokens). This is exactly how reference BPE trainers work; the corpus
   size only ever affects the single word-count shuffle.
2. **Per-iteration work is one partial-agg'd groupBy + one codegen'd
   fold.** Pair counts come from an in-row ``arrays_zip(slice, slice)``
   explode (no positions self-join), weighted by word freq; the argmax
   pair is a 1-row driver fetch (deterministic tiebreak: count desc, pair
   asc); applying the merge is a left-to-right ``aggregate()`` fold over
   each symbol array — greedy non-overlapping, the standard BPE apply —
   with the frontier ``localCheckpoint``'d per round to truncate lineage
   (the BFS/PageRank discipline).

The merge list is deterministic (exact integer counts + total tiebreak),
so pytest pins it against a pure-Python reference trainer on the same
word counts; the registered query is rows-only (no SQL oracle can express
the iterative argmax loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.session import materialize, widen_scan

N_MERGES = 20


def word_type_counts(docs: DataFrame) -> DataFrame:
    """(word, freq) over the corpus — the ONE corpus-sized aggregation."""
    return (
        docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbolized word table, weighted
    by word freq. Pairs are built in-row (zip of the array with its own
    shift) — a projection, not a join."""
    pairs = F.expr(
        "arrays_zip(slice(syms, 1, greatest(size(syms) - 1, 0)),"
        " slice(syms, 2, greatest(size(syms) - 1, 0)))"
    )
    return (
        words.select("freq", F.explode(pairs).alias("p"))
        .select(
            F.col("p")["0"].alias("left"),
            F.col("p")["1"].alias("right"),
            "freq",
        )
        .groupBy("left", "right")
        .agg(F.sum("freq").alias("n"))
    )


def _apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of adjacent (left, right) → left||right
    in every symbol array — a codegen'd aggregate() fold, no UDF."""
    l_sql = left.replace("'", "''")
    r_sql = right.replace("'", "''")
    fold = (
        "aggregate(syms, CAST(array() AS array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{l_sql}' "
        f"AND x = '{r_sql}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{l_sql}{r_sql}')) "
        "ELSE concat(acc, array(x)) END)"
    )
    return words.withColumn("syms", F.expr(fold))


def train_bpe_merges(
    docs: DataFrame, n_merges: int = N_MERGES, checkpoint_every: int = 2
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, count)] in
    merge order.

    The frontier is localCheckpoint'd every ``checkpoint_every`` merges
    rather than every merge: the barrier costs a materialization of the
    word-type table, and a single pending ``aggregate()`` fold on top of
    a checkpoint is cheaper for the next pair-count pass than paying the
    barrier again (interleaved 3-rep A/B at sf0.1, identical merge
    lists: every-merge 3.10/3.50 s min/med → every-2 2.74/2.97 s, −12%
    min; every-4 ties every-2, so the shortest lineage bound wins —
    PLANS.md round-10). Cost stays word-TYPE-table-sized either way."""
    words = (
        word_type_counts(docs)
        .select(
            F.expr("transform(split(word, ''), x -> x)").alias("syms"), "freq"
        )
        .transform(materialize)
    )
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0].n < 2:
            break
        left, right, n = top[0].left, top[0].right, top[0].n
        merges.append((left, right, n))
        words = _apply_merge(words, left, right)
        if (i + 1) % checkpoint_every == 0:
            words = words.transform(materialize)
    return merges


def q_bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Registered form: the learned merge table (rank, left, right,
    merged, pair_count). rows-only — the iterative argmax loop has no SQL
    mirror; pytest pins the merge list against a pure-Python reference
    trainer on identical word counts."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    merges = train_bpe_merges(docs, n_merges)
    rows = [
        (i + 1, left, right, left + right, n)
        for i, (left, right, n) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_count bigint"
    )


def encode_word_types(
    words: DataFrame, merges: list[tuple[str, str, int]], checkpoint_every: int = 5
) -> DataFrame:
    """Apply a learned merge list (rank order) to the word-TYPE table:
    (word, freq) → (word, freq, n_tokens). Encoding a fresh word with the
    standard rank-priority BPE apply is equivalent to one greedy
    left-to-right fold per merge in rank order — the same
    ``aggregate()`` fold the trainer uses, so train and encode share one
    kernel and pytest can pin them against one Python reference.

    The fold chain is localCheckpoint'd every ``checkpoint_every`` merges
    to keep the Catalyst expression tree (and codegen method size)
    bounded — the BFS/PageRank lineage discipline applied to expression
    depth. Cost is per word TYPE, never per corpus token.
    """
    syms = words.withColumn(
        "syms", F.expr("transform(split(word, ''), x -> x)")
    )
    for i, (left, right, _) in enumerate(merges):
        syms = _apply_merge(syms, left, right)
        if (i + 1) % checkpoint_every == 0:
            syms = syms.transform(materialize)
    return syms.select("word", "freq", F.size("syms").alias("n_tokens"))


def q_bpe_encode(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Registered form: per-document token accounting under the learned
    BPE vocabulary — (doc_id, n_words, n_chars, n_bpe_tokens). The
    serving half of the tokenizer pipeline (``bpe_train`` learns the
    merges; this applies them corpus-wide).

    Scale shape: merges are learned and applied on the word-TYPE table
    (≈10⁶ rows at 100 TB), then the per-word token counts are joined back
    to the exploded corpus on the word key and rolled up per doc. The
    type table is broadcast (a few MB even at web scale — it carries 3
    scalar columns), so the corpus side never shuffles: explode →
    broadcast-hash-join → partial-agg'd groupBy(doc_id). rows-only (the
    iterative merge training has no SQL mirror); pytest pins the encoded
    counts against a pure-Python encoder on identical merges.
    """
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    merges = train_bpe_merges(docs, n_merges)
    types = encode_word_types(word_type_counts(docs), merges).select(
        "word", "n_tokens"
    )
    doc_words = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        doc_words.join(F.broadcast(types), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_tokens").alias("n_bpe_tokens"),
        )
    )


# --- fixed-merge-list encode (the oracle-expressible serving half) ----------
#
# bpe_encode is rows-only because the TRAINER loop (iterative argmax) has
# no SQL mirror — but the ENCODE kernel itself does: greedy left-to-right
# non-overlapping merge of one (left, right) pair over a symbol sequence
# is exactly replace-all over a separator-wrapped string ("␟a␟␟b␟" →
# "␟ab␟" — each symbol wrapped in U+001F, so a pattern can only match at
# true symbol boundaries and consecutive matches don't share characters),
# and a FIXED rank-ordered merge list unrolls to nested replace() calls —
# identical semantics in Spark and DuckDB. This registered twin applies a
# fixed merge list so the fold kernel gets a cross-engine hash-matched
# oracle; the learned-merge form stays pinned by pure-Python parity.

FIXED_MERGES: list[tuple[str, str]] = [
    # chains exercise rank-order dependence: later merges consume the
    # symbols earlier merges created (s+c → sc+a → sca+n tokenizes
    # "scan" to one symbol only if applied in order)
    ("s", "c"),
    ("sc", "a"),
    ("sca", "n"),
    ("r", "o"),
    ("ro", "w"),
    ("t", "a"),
    ("h", "a"),
    ("e", "r"),
]

_SEP = "\x1f"  # unit separator; wraps every symbol (not in the corpus)


def _wrap_expr(word_col: str) -> str:
    """Spark SQL: word → per-character separator-wrapped form."""
    return (
        f"array_join(transform(split({word_col}, ''),"
        f" c -> concat('{_SEP}', c, '{_SEP}')), '')"
    )


def fixed_encode_token_count(
    word_col: str, merges: list[tuple[str, str]] = FIXED_MERGES
) -> Column:
    """n_tokens of ``word_col`` under the fixed merge list, as a single
    codegen'd expression: wrap → one replace() per merge in rank order →
    count separators / 2. Per word TYPE, JVM-side, no UDF."""
    expr = _wrap_expr(word_col)
    for left, right in merges:
        pat = f"{_SEP}{left}{_SEP}{_SEP}{right}{_SEP}"
        rep = f"{_SEP}{left}{right}{_SEP}"
        expr = f"replace({expr}, '{pat}', '{rep}')"
    return F.expr(
        f"(length({expr}) - length(replace({expr}, '{_SEP}', ''))) / 2"
    ).cast("long")


def q_bpe_encode_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token accounting under the FIXED merge list —
    (doc_id, n_words, n_chars, n_bpe_tokens). Same scale shape as
    :func:`q_bpe_encode`: merges apply on the word-TYPE table (the
    replace chain runs once per distinct word, never per corpus token),
    the ≤vocab-sized (word, n_tokens) side broadcasts, and the corpus
    pays one explode → broadcast join → per-doc agg. The DuckDB oracle
    replays the identical replace chain (BPE_ENCODE_FIXED_SQL); pytest
    additionally pins this kernel ≡ the trainer's aggregate() fold
    (:func:`encode_word_types`) on the same merges."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    types = word_type_counts(docs).select(
        "word", fixed_encode_token_count("word").alias("n_tokens")
    )
    doc_words = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        doc_words.join(F.broadcast(types), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_tokens").alias("n_bpe_tokens"),
        )
    )


def bpe_encode_fixed_sql(merges: list[tuple[str, str]] = FIXED_MERGES) -> str:
    """DuckDB mirror of :func:`q_bpe_encode_fixed`: the same wrap +
    rank-ordered replace chain per word type, joined back to the exploded
    corpus. replace() is left-to-right non-overlapping in both engines —
    exactly the greedy BPE apply."""
    expr = (
        "list_aggregate(list_transform(string_split(word, ''),"
        f" c -> '{_SEP}' || c || '{_SEP}'), 'string_agg', '')"
    )
    for left, right in merges:
        pat = f"{_SEP}{left}{_SEP}{_SEP}{right}{_SEP}"
        rep = f"{_SEP}{left}{right}{_SEP}"
        expr = f"replace({expr}, '{pat}', '{rep}')"
    return rf"""
WITH words AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents
),
nonempty AS (SELECT doc_id, word FROM words WHERE word <> ''),
types AS (
  SELECT word,
         CAST((length(enc) - length(replace(enc, '{_SEP}', ''))) / 2 AS BIGINT)
             AS n_tokens
  FROM (SELECT DISTINCT word FROM nonempty), LATERAL (SELECT {expr} AS enc)
)
SELECT w.doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(length(w.word)) AS BIGINT) AS n_chars,
       CAST(SUM(t.n_tokens) AS BIGINT) AS n_bpe_tokens
FROM nonempty w JOIN types t USING (word)
GROUP BY w.doc_id
"""


BPE_ENCODE_FIXED_SQL = bpe_encode_fixed_sql()


def reference_bpe_encode(
    word: str, merges: list[tuple[str, str, int]]
) -> list[str]:
    """Pure-Python encode: one greedy left-to-right pass per merge in
    rank order — the exact fold semantics of :func:`encode_word_types`."""
    syms = list(word)
    for left, right, _ in merges:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        syms = out
    return syms


def reference_bpe_merges(
    word_freqs: dict[str, int], n_merges: int = N_MERGES
) -> list[tuple[str, str, int]]:
    """Pure-Python reference trainer (same greedy left-to-right apply and
    the same (count desc, pair asc) tiebreak) — the pytest ground truth."""
    words: list[tuple[list[str], int]] = [
        (list(w), f) for w, f in word_freqs.items()
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((left, right, n))
        merged = left + right
        new_words = []
        for syms, f in words:
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            new_words.append((out, f))
        words = new_words
    return merges
