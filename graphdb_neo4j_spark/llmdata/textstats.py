"""Text analysis over the ``documents`` table: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All hot-path expressions are built-in `pyspark.sql.functions` (JVM-side,
whole-stage codegen). The winnowing fingerprint uses window functions +
xxhash64 — engine-specific hashing, so it registers rows-only; everything
else has an exact DuckDB SQL mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphdb_neo4j_spark.session import materialize, widen_scan

# Whitespace tokenization of trimmed text — mirrored in SQL as
# regexp_split_to_array(trim(text), '\s+').
def _tokens(col: F.Column) -> F.Column:
    return F.split(F.trim(col), r"\s+")


STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts — n_tokens, n_distinct, chars_per_token."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    toks = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (F.col("n_chars").cast("double") / F.size(toks)).alias("chars_per_token"),
    )


TOKEN_STATS_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
       CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS INT)
           AS n_distinct_tokens,
       CAST(n_chars AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+'))
           AS chars_per_token
FROM documents
"""


# BPE-style pre-tokenization (the GPT-2 pre-tokenizer shape, ASCII-safe so
# Java regex and DuckDB RE2 agree byte-for-byte): contraction suffixes,
# space-prefixed letter runs, space-prefixed digit runs, space-prefixed
# punctuation runs. This is the unit a byte-pair encoder merges WITHIN, so
# its count is the standard pre-merge estimate of BPE token counts (an
# upper bound: merges only ever reduce it).
BPE_SPLIT_PATTERN = r"'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD]| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"


def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE-ish token counts next to the whitespace count —
    the pair a data pipeline budgets sequence lengths with. All built-in
    JVM expressions (`regexp_extract_all`), no UDF."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    pieces = F.expr(f"regexp_extract_all(text, \"{BPE_SPLIT_PATTERN}\", 0)")
    ws = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(pieces).alias("n_bpe_tokens"),
        F.size(ws).alias("n_ws_tokens"),
        (F.size(pieces).cast("double") / F.size(ws)).alias("bpe_per_word"),
        (F.col("n_chars").cast("double") / F.size(pieces)).alias(
            "chars_per_bpe_token"
        ),
    )


_BPE_SQL_PATTERN = BPE_SPLIT_PATTERN.replace("'", "''")  # SQL-literal escape

BPE_TOKEN_STATS_SQL = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_SQL_PATTERN}', 0)) AS INT)
           AS n_bpe_tokens,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_SQL_PATTERN}', 0)) AS DOUBLE)
           / len(regexp_split_to_array(trim(text), '\s+')) AS bpe_per_word,
       CAST(n_chars AS DOUBLE)
           / len(regexp_extract_all(text, '{_BPE_SQL_PATTERN}', 0))
           AS chars_per_bpe_token
FROM documents
"""


def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document — the quality family's
    repetition axis (duplicate-heavy docs are low-value training data even
    when length/punctuation look fine):

    - ``dup_token_frac``  — fraction of token occurrences that are repeats
      (1 − distinct/total);
    - ``top_token_frac``  — fraction of tokens taken by the single most
      frequent token;
    - ``top_bigram_frac`` — fraction of word-bigram occurrences taken by
      the most frequent bigram (0 for docs with <2 tokens).

    Plan shape: one scan → explode tokens (and constructed bigrams) →
    (doc_id, gram) partial-aggregated counts → per-doc max/sum — every
    shuffle is keyed by doc_id(+gram) with map-side combine, and the final
    joins are doc_id ↔ doc_id co-partitioned. Fraction-only outputs avoid
    per-doc argmax strings, so ties cost nothing."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    base = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("t")
    )
    # bigrams from the token array; guard size<2 (Spark's sequence() would
    # generate a DESCENDING range for an empty window)
    bigrams = F.expr(
        "CASE WHEN size(t) >= 2 THEN "
        "transform(sequence(0, size(t) - 2), i -> t[i] || ' ' || t[i + 1]) "
        "ELSE array() END"
    )

    tok_counts = (
        base.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("n"))
    )
    tok_stats = tok_counts.groupBy("doc_id").agg(
        F.sum("n").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("n").alias("top_n"),
    )
    bg_counts = (
        base.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("n"))
    )
    bg_stats = bg_counts.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"), F.max("n").alias("top_bg")
    )
    joined = tok_stats.join(bg_stats, "doc_id", "left")
    return joined.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            (F.col("n_tokens") - F.col("n_distinct")).cast("double")
            / F.col("n_tokens"),
            6,
        ).alias("dup_token_frac"),
        F.round(F.col("top_n").cast("double") / F.col("n_tokens"), 6).alias(
            "top_token_frac"
        ),
        F.round(
            F.coalesce(
                F.col("top_bg").cast("double") / F.col("n_bigrams"), F.lit(0.0)
            ),
            6,
        ).alias("top_bigram_frac"),
    )


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram log-probability per document — the SQL-expressible
    form of the LM-perplexity quality filter (CCNet-style: score each doc
    under a model of the corpus; outliers on either end are boilerplate
    or gibberish). Model = unigram MLE over the corpus itself.

    Outputs per doc: ``avg_logprob`` (mean ln p(tok), ≤ 0) and
    ``unigram_ppl`` (exp of its negation — the perplexity form filter
    thresholds are usually quoted in).

    Plan shape: one explode → global (tok, count) table (one shuffle of
    |vocab| rows, map-side combined) → token-keyed join back to the token
    stream (co-partitioned on tok) → per-doc sum (one shuffle on doc_id).
    The corpus-total token count is a 1-row aggregate broadcast into the
    join — never a global window."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    )
    # |vocab|-sized, consumed twice (total + the scoring join) — the
    # bigram_logprob discipline: checkpoint the SMALL shuffle output so
    # neither consumer re-runs the tokenize + count shuffle
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("tok_n"))
        .transform(materialize)
    )
    total = vocab.agg(F.sum("tok_n").alias("total"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.log(F.col("tok_n").cast("double") / F.col("total")).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            (F.sum("lp") / F.count("*")).alias("avg_lp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round("avg_lp", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("avg_lp")), 4).alias("unigram_ppl"),
        )
    )


UNIGRAM_LOGPROB_SQL = r"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
    FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS tok_n FROM toks GROUP BY tok),
total AS (SELECT CAST(SUM(tok_n) AS DOUBLE) AS total FROM vocab),
scored AS (
    SELECT t.doc_id, ln(CAST(v.tok_n AS DOUBLE) / total.total) AS lp
    FROM toks t JOIN vocab v USING (tok) CROSS JOIN total
),
per_doc AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           SUM(lp) / COUNT(*) AS avg_lp
    FROM scored GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       ROUND(avg_lp, 6) AS avg_logprob,
       ROUND(exp(-avg_lp), 4) AS unigram_ppl
FROM per_doc
"""


REPETITION_SCORES_SQL = r"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
    FROM documents
),
tok_counts AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY 1, 2),
tok_stats AS (
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct,
           MAX(n) AS top_n
    FROM tok_counts GROUP BY 1
),
bg AS (
    SELECT doc_id, unnest(bigrams) AS bigram FROM (
        SELECT doc_id,
               list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
                   AS bigrams
        FROM (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\s+') AS t
            FROM documents
        )
    )
),
bg_counts AS (SELECT doc_id, bigram, COUNT(*) AS n FROM bg GROUP BY 1, 2),
bg_stats AS (
    SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams, MAX(n) AS top_bg
    FROM bg_counts GROUP BY 1
)
SELECT t.doc_id,
       t.n_tokens,
       ROUND(CAST(t.n_tokens - t.n_distinct AS DOUBLE) / t.n_tokens, 6)
           AS dup_token_frac,
       ROUND(CAST(t.top_n AS DOUBLE) / t.n_tokens, 6) AS top_token_frac,
       ROUND(COALESCE(CAST(b.top_bg AS DOUBLE) / b.n_bigrams, 0), 6)
           AS top_bigram_frac
FROM tok_stats t LEFT JOIN bg_stats b USING (doc_id)
"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals + a composite
    score in [0,1]: long enough, low punctuation, a natural stopword rate."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[\w\s]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    )
    punct_ratio = n_punct.cast("double") / F.col("n_chars")
    stop_ratio = stop_hits.cast("double") / n_tokens
    length_ok = F.when(n_tokens >= 20, 1).otherwise(0)
    score = (
        0.4 * length_ok
        + 0.3 * F.when(punct_ratio <= 0.1, 1).otherwise(0)
        + 0.3 * F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.6), 1).otherwise(0)
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


QUALITY_SCORES_SQL = rf"""
WITH base AS (
    SELECT doc_id, n_chars,
           regexp_split_to_array(trim(text), '\s+') AS toks,
           length(regexp_replace(text, '[\w\s]', '', 'g')) AS n_punct
    FROM documents
),
m AS (
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(n_punct AS INT) AS n_punct,
           CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
           CAST(len(list_filter(toks, t -> t IN ({_STOP_SQL}))) AS DOUBLE) / len(toks)
               AS stop_ratio
    FROM base
)
SELECT doc_id, n_tokens, n_punct,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(stop_ratio, 6) AS stopword_ratio,
       CAST(ROUND(0.4 * (CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END)
           + 0.3 * (CASE WHEN punct_ratio <= 0.1 THEN 1 ELSE 0 END)
           + 0.3 * (CASE WHEN stop_ratio >= 0.01 AND stop_ratio <= 0.6 THEN 1 ELSE 0 END),
           2) AS DOUBLE) AS quality_score
FROM m
"""


# Marker-word profiles for the language-ID heuristic (top function words).
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is", "to"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "es": ("el", "la", "de", "que", "los", "es"),
}
_DEFAULT_LANG = "unknown"


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-free language ID: function-word hit counts per language,
    argmax with deterministic precedence (en > de > fr > es on ties),
    'unknown' when nothing matches."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    toks = _tokens(F.lower(F.col("text")))

    def hits(markers: tuple[str, ...]) -> F.Column:
        # NB: the lambda must be unary — F.filter treats a 2-arg lambda as
        # (element, index)
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    hit_cols = {lang: hits(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*hit_cols.values())
    pred = F.when(best <= 0, F.lit(_DEFAULT_LANG))
    for lang in LANG_MARKERS:  # insertion order = precedence
        pred = pred.when(hit_cols[lang] == best, F.lit(lang))
    return docs.select(
        "doc_id",
        *[hit_cols[lang].alias(f"hits_{lang}") for lang in LANG_MARKERS],
        pred.alias("predicted_lang"),
    )


def _lang_id_sql() -> str:
    hit_exprs = ",\n           ".join(
        f"CAST(len(list_filter(toks, t -> t IN ({', '.join(repr(w) for w in m)}))) AS INT) AS hits_{lang}"
        for lang, m in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    case = "CASE WHEN " + best + " <= 0 THEN 'unknown' "
    for lang in langs:
        case += f"WHEN hits_{lang} = {best} THEN '{lang}' "
    case += "END"
    return rf"""
WITH base AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
    FROM documents
),
hits AS (
    SELECT doc_id,
           {hit_exprs}
    FROM base
)
SELECT doc_id, {', '.join(f'hits_{lang}' for lang in langs)},
       {case} AS predicted_lang
FROM hits
"""


LANG_ID_SQL = _lang_id_sql()


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document fingerprint: md5 of whitespace-normalized lowercase
    text (the exact-dedup key)."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", F.md5(normalized).alias("fingerprint"))


DOC_FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


def winnowing_fingerprints(
    docs: DataFrame, k: int = 3, window: int = 4, portable: bool = False
) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD 2003): hash token k-grams, keep
    the minimum hash in each sliding window of ``window`` consecutive
    k-grams — a position-robust fingerprint set per document.

    The k-gram hash defaults to xxhash64 (one JVM hash — the at-scale
    library form). ``portable=True`` switches to the md5-prefix scheme
    the repo already replays bit-identically in DuckDB (Spark
    ``conv(substr(md5(g),1,8),16,10)`` ≡ DuckDB
    ``('0x'||substr(md5(g),1,8))::BIGINT``): winnowing depends only on
    per-window argmin, no hash property beyond determinism, so the
    fingerprint sets hash-match cross-engine — the registered
    ``winnowing_fingerprint`` uses it (oracle-promoted r10). Window/lead
    work is per-doc (bounded by document length), never corpus-wide.
    """
    toks = (
        docs.select("doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "tok"))
    )
    w_gram = Window.partitionBy("doc_id").orderBy("pos")
    kgram = F.concat_ws(" ", *[F.lead("tok", i).over(w_gram) for i in range(k)])
    if portable:
        h = F.conv(F.substring(F.md5("kgram"), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64("kgram")
    grams = (
        toks.select("doc_id", "pos", kgram.alias("kgram"))
        .filter(F.size(F.split(F.col("kgram"), " ")) == k)
        .select("doc_id", "pos", h.alias("h"))
    )
    w_min = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    fps = (
        grams.select("doc_id", F.min("h").over(w_min).alias("fp"))
        .distinct()
    )
    return fps.groupBy("doc_id").agg(
        F.count("*").alias("n_fingerprints"),
        F.md5(F.concat_ws(",", F.array_sort(F.collect_set("fp")))).alias("fp_sig"),
    )


def winnowing_sql(k: int = 3, window: int = 4) -> str:
    """DuckDB mirror of :func:`winnowing_fingerprints` (portable hash).

    Same stages, independently expressed: lead-built k-grams filtered to
    full width, md5-prefix hash, ROWS-frame min per sliding window,
    distinct fingerprints, then the sorted-set signature digest.
    """
    leads = ", ".join(f"lead(tok, {i}) OVER w" for i in range(1, k))
    return rf"""
WITH toks AS (
    SELECT doc_id,
           unnest(range(1, len(arr) + 1)) AS pos,
           unnest(arr) AS tok
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
          FROM documents)
),
grams AS (
    SELECT doc_id, pos, concat_ws(' ', tok, {leads}) AS kgram
    FROM toks
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
hashed AS (
    SELECT doc_id, pos,
           ('0x' || substr(md5(kgram), 1, 8))::BIGINT AS h
    FROM grams
    WHERE len(string_split(kgram, ' ')) = {k}
),
fps AS (
    SELECT DISTINCT doc_id,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS fp
    FROM hashed
)
SELECT doc_id,
       COUNT(*) AS n_fingerprints,
       md5(string_agg(fp::VARCHAR, ',' ORDER BY fp)) AS fp_sig
FROM fps
GROUP BY doc_id
"""


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return winnowing_fingerprints(docs, portable=True)


# --- TF-IDF -----------------------------------------------------------------


def q_tfidf_top_terms(
    spark: SparkSession, sf_dir: str, top_k: int = 3
) -> DataFrame:
    """Per-document top-k terms by tf·idf (idf = ln(N/df)).

    Three aggregations, all keyed and partial-agg friendly: term counts
    per (doc, term), document frequency per term (from the already-distinct
    (doc, term) rows — no second scan of raw tokens), and the scalar corpus
    size broadcast into the scoring join. Ranking is row_number over
    (score DESC, term ASC) per doc — deterministic under ties — planned as
    a per-doc-partition window, no global sort.
    """
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    )
    # consumed twice (df build + scoring join): un-materialized, the df
    # branch re-ran tokenize + the (doc, term) shuffle (scans=3,
    # 1.5 s warm sf0.1; checkpointed: 1.1 s). tf is the per-doc DISTINCT
    # term table — well below the raw token stream — so materializing it
    # clears the small-result bar of the materialize-then-consume rule
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .transform(materialize)
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.groupBy().agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score", F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "term", F.round("score", 6).alias("score"), "rank")
    )


def tfidf_top_terms_sql(top_k: int = 3) -> str:
    return rf"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term,
           tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS score
    FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
    SELECT doc_id, term, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS INT) AS rank
    FROM scored
)
SELECT doc_id, term, ROUND(score, 6) AS score, rank
FROM ranked WHERE rank <= {top_k}
"""


# --- document chunking -------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def q_doc_chunks(
    spark: SparkSession,
    sf_dir: str,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Sliding-window token chunks — the context-window splitting step of a
    training/RAG pipeline: windows of ``chunk_tokens`` whitespace tokens
    starting every ``chunk_tokens - overlap`` tokens, while the start lies
    within max(n_tokens - overlap, 1) (so a final short window is emitted
    once and empty docs yield exactly one chunk).

    All array ops (split / sequence / slice / array_join) are JVM built-ins
    exploded via posexplode — no UDF; work is one narrow pass per doc.
    ``chunk_idx`` derives from the start offset, so the output is
    deterministic regardless of row order.
    """
    stride = chunk_tokens - overlap
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    toks = F.split(F.trim(F.col("text")), r"\s+")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    exploded = docs.select(
        "doc_id", toks.alias("toks"), F.explode(starts).alias("start")
    )
    chunk = F.slice("toks", F.col("start"), chunk_tokens)
    return exploded.select(
        "doc_id",
        ((F.col("start") - 1) / stride).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


def doc_chunks_sql(
    chunk_tokens: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP
) -> str:
    stride = chunk_tokens - overlap
    return rf"""
WITH base AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
    FROM documents
),
exploded AS (
    SELECT doc_id, toks,
           unnest(range(1, greatest(len(toks) - {overlap}, 1) + 1, {stride})) AS start
    FROM base
)
SELECT doc_id,
       CAST((start - 1) / {stride} AS INT) AS chunk_idx,
       CAST(len(toks[start : start + {chunk_tokens} - 1]) AS INT) AS n_chunk_tokens,
       md5(array_to_string(toks[start : start + {chunk_tokens} - 1], ' ')) AS chunk_md5
FROM exploded
"""


# --- sequence packing --------------------------------------------------------

SEQ_TOKENS = 512


def q_sequence_pack(
    spark: SparkSession, sf_dir: str, seq_tokens: int = SEQ_TOKENS
) -> DataFrame:
    """GPT-style contiguous sequence packing: documents are concatenated
    in doc_id order into one token stream cut into fixed ``seq_tokens``
    sequences; each doc is assigned the sequence containing its FIRST
    token plus its offset there (docs may span a boundary —
    ``spans_boundary`` flags them; a real tokenizer step consumes this
    layout directly).

    Implemented as a distributed prefix sum (range partition → local
    window cumsum → broadcast per-range offsets), so no stage ever
    funnels the corpus through one task; the only global window runs
    over n_partitions rows.
    """
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    # Distributed prefix sum — NOT Window.orderBy(doc_id) alone, which
    # collapses the whole corpus onto one task. Range-partition by doc_id
    # (ordered, non-overlapping ranges), local running sum per range, then
    # add each range's broadcast cumulative offset — exact global cumsum,
    # every stage n_parts-wide.
    parts = (
        docs.select("doc_id", F.size(_tokens(F.col("text"))).alias("n_tokens"))
        .repartitionByRange(n_parts, "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    wl = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parts.withColumn("local_cum", F.sum("n_tokens").over(wl))
    wo = (
        Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # n_parts rows — trivially single-task
    offsets = (
        parts.groupBy("pid")
        .agg(F.sum("n_tokens").alias("tot"))
        .withColumn("off", F.coalesce(F.sum("tot").over(wo), F.lit(0)))
        .select("pid", "off")
    )
    cum = F.col("local_cum") + F.col("off")
    start = cum - F.col("n_tokens")  # 0-based offset of this doc's first token
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            "doc_id",
            "n_tokens",
            (start / seq_tokens).cast("bigint").alias("seq_id"),
            (start % seq_tokens).cast("bigint").alias("offset_in_seq"),
            (
                (start / seq_tokens).cast("bigint")
                != ((cum - 1) / seq_tokens).cast("bigint")
            ).alias("spans_boundary"),
        )
    )


def sequence_pack_sql(seq_tokens: int = SEQ_TOKENS) -> str:
    return rf"""
WITH base AS (
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
    FROM documents
),
runs AS (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
    FROM base
)
SELECT doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       CAST((cum - n_tokens) // {seq_tokens} AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % {seq_tokens} AS BIGINT) AS offset_in_seq,
       (cum - n_tokens) // {seq_tokens} <> (cum - 1) // {seq_tokens} AS spans_boundary
FROM runs
"""


# --- PPMI co-occurrence ------------------------------------------------------

COOC_WINDOW = 2  # co-occurrence distance: pairs at token distance 1..2
PPMI_TOP_K = 3


def q_ppmi_topk(
    spark: SparkSession,
    sf_dir: str,
    window: int = COOC_WINDOW,
    top_k: int = PPMI_TOP_K,
    min_pair_count: int = 5,
    vocab_checkpoint: bool = False,
) -> DataFrame:
    """Distributional association mining: for every term, its ``top_k``
    most-associated co-occurring terms by positive pointwise mutual
    information (PPMI = max(0, log(p(a,b) / p(a)p(b))) — the classic
    count-based word-vector/collocation statistic).

    Scale shape: co-occurring pairs are built INSIDE the row — a
    codegen'd ``arrays_zip(slice(arr, ...), slice(arr, ...))`` per
    distance 1..window over the token array — so pair generation is a
    projection, not a positions self-join (the join form's cost is
    Σ_doc len·window but pays a doc_id shuffle and an equi-join; this
    form pays nothing). One groupBy counts pairs, one counts unigrams,
    both partial-agg'd; totals ride along as literal-free single-row
    broadcasts. The DuckDB oracle DOES use the positions self-join, so
    the two engines agree through different pair-generation algorithms.
    ``min_pair_count`` kills the long noise tail (hapax pairs have
    unstable PMI and at 100 TB dominate the pair table).
    """
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    arr = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("arr")
    )
    pair_cols = []
    for dist in range(1, window + 1):
        pair_cols.append(
            F.expr(
                f"arrays_zip(slice(arr, 1, greatest(size(arr) - {dist}, 0)),"
                f" slice(arr, {dist + 1}, greatest(size(arr) - {dist}, 0)))"
            )
        )
    pairs = (
        arr.select(F.explode(F.flatten(F.array(*pair_cols))).alias("p"))
        .select(
            F.least(F.col("p")["0"], F.col("p")["1"]).alias("a"),
            F.greatest(F.col("p")["0"], F.col("p")["1"]).alias("b"),
        )
    )
    pair_counts = (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    toks = arr.select(F.explode("arr").alias("tok"))
    # |vocab|-sized and consumed twice (n_a and n_b broadcasts); a
    # checkpoint here measured SLOWER at sf0.1 (1.9 → 2.1 s A/B — the
    # barrier beats the re-run) AND at the 10× stand-in (r6: 2.4 s
    # either way, within noise — the pair explode dominates, not the
    # vocab re-run), so the double subtree stays the default
    tok_counts = toks.groupBy("tok").agg(F.count("*").alias("n_tok"))
    if vocab_checkpoint:
        tok_counts = tok_counts.transform(materialize)
    total_pairs = pairs.count()
    total_toks = toks.count()
    scored = (
        pair_counts.join(
            F.broadcast(tok_counts.withColumnRenamed("tok", "a").withColumnRenamed("n_tok", "n_a")),
            "a",
        )
        .join(
            F.broadcast(tok_counts.withColumnRenamed("tok", "b").withColumnRenamed("n_tok", "n_b")),
            "b",
        )
        .select(
            "a",
            "b",
            "n_ab",
            F.greatest(
                F.lit(0.0),
                F.log(
                    (F.col("n_ab").cast("double") / F.lit(float(total_pairs)))
                    / (
                        (F.col("n_a").cast("double") / F.lit(float(total_toks)))
                        * (F.col("n_b").cast("double") / F.lit(float(total_toks)))
                    )
                ),
            ).alias("ppmi_raw"),
        )
    )
    w = Window.partitionBy("a").orderBy(
        F.desc("ppmi_raw"), F.asc("b")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(
            F.col("a").alias("term"),
            F.col("b").alias("assoc"),
            "n_ab",
            F.round("ppmi_raw", 6).alias("ppmi"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def ppmi_topk_sql(
    window: int = COOC_WINDOW, top_k: int = PPMI_TOP_K, min_pair_count: int = 5
) -> str:
    return rf"""
WITH arrs AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
              FROM documents),
toks AS (SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos
         FROM arrs),
pairs AS (
    SELECT LEAST(t1.tok, t2.tok) AS a, GREATEST(t1.tok, t2.tok) AS b
    FROM toks t1 JOIN toks t2
      ON t1.doc_id = t2.doc_id
     AND t2.pos - t1.pos BETWEEN 1 AND {window}
),
pair_counts AS (
    SELECT a, b, COUNT(*) AS n_ab FROM pairs GROUP BY 1, 2
    HAVING COUNT(*) >= {min_pair_count}
),
tok_counts AS (SELECT tok, COUNT(*) AS n_tok FROM toks GROUP BY 1),
totals AS (SELECT (SELECT COUNT(*) FROM pairs) AS t_pairs,
                  (SELECT COUNT(*) FROM toks) AS t_toks),
scored AS (
    SELECT p.a, p.b, p.n_ab,
           GREATEST(0.0, LN(
               (CAST(p.n_ab AS DOUBLE) / t.t_pairs)
               / ((CAST(ca.n_tok AS DOUBLE) / t.t_toks)
                  * (CAST(cb.n_tok AS DOUBLE) / t.t_toks)))) AS ppmi_raw
    FROM pair_counts p
    CROSS JOIN totals t
    JOIN tok_counts ca ON p.a = ca.tok
    JOIN tok_counts cb ON p.b = cb.tok
)
SELECT a AS term, b AS assoc, n_ab,
       ROUND(ppmi_raw, 6) AS ppmi,
       CAST(ROW_NUMBER() OVER (PARTITION BY a ORDER BY ppmi_raw DESC, b ASC) AS INT) AS rk
FROM scored
QUALIFY rk <= {top_k}
"""


# --- interpolated bigram LM scoring ------------------------------------------

BIGRAM_LAMBDA = 0.75  # weight on the bigram MLE; remainder backs off to unigram


def q_bigram_logprob(
    spark: SparkSession, sf_dir: str, vocab_checkpoint: bool = False
) -> DataFrame:
    """Interpolated-bigram log-probability per document — the next model
    up from :func:`q_unigram_logprob` on the CCNet-style quality ladder:
    p(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/N. Word salad that sails
    through a unigram filter (common words, random order) scores badly
    here because the TRANSITIONS are improbable.

    Outputs per doc: n_bigrams, ``avg_logprob`` (mean ln p over the doc's
    bigrams), ``bigram_ppl``. Docs with < 2 tokens have no bigrams and
    drop out (documented; both engines agree).

    Plan shape: bigrams are built IN-ROW (codegen'd transform over the
    token array — the ppmi_topk technique, no positions self-join), then:
    one (w1,w2)-keyed count shuffle (map-side combined — the Zipfian head
    collapses before moving), one join of the doc bigram stream back to
    those counts on the same key (exchange reuse), and two token-keyed
    joins for the c(w1)/c(w2) backoff terms. The unigram table is
    |vocab|-sized — broadcastable on small corpora, a plain co-partitioned
    shuffle join at 100 TB (Zipf skew partial-aggs away; AQE handles the
    residual hot keys). The corpus total is a 1-row broadcast.
    """
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    arrs = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("arr")
    )
    pairs = F.expr(
        "CASE WHEN size(arr) >= 2 THEN "
        "transform(sequence(1, size(arr) - 1),"
        " i -> struct(arr[i-1] AS w1, arr[i] AS w2)) "
        "ELSE array() END"
    )
    bi = arrs.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    toks = arrs.select("doc_id", F.explode("arr").alias("tok"))
    # |vocab|-sized and consumed THREE times (total, c1 join, c2 join).
    # The r6 bench-harness A/B (5 alternating reps, clearCache+gc between,
    # sf0.1): checkpoint median 2.50 s / min 2.02 vs NO-checkpoint median
    # 2.10 s / min 1.97 — the barrier (extra job + materialize) costs more
    # than the 3 redundant tokenize+count passes while the corpus is
    # small (plan audit: 2 FileScans checkpointed vs 5 un-checkpointed).
    # Default = the measured-faster form at bench scale; flip
    # ``vocab_checkpoint`` when the corpus passes dominate (the r5 form —
    # at 100 TB you'd go further and persist the vocab table once, the
    # run_corpus_pipeline discipline).
    uni = toks.groupBy("tok").agg(F.count("*").alias("c_tok"))
    if vocab_checkpoint:
        uni = uni.transform(materialize)
    total = uni.agg(F.sum("c_tok").cast("double").alias("total"))
    bic = bi.groupBy("w1", "w2").agg(F.count("*").alias("c_bi"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c_tok").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c_tok").alias("c2"))
    lam = F.lit(BIGRAM_LAMBDA)
    p = lam * (F.col("c_bi").cast("double") / F.col("c1")) + (
        F.lit(1.0) - lam
    ) * (F.col("c2").cast("double") / F.col("total"))
    scored = (
        bi.join(bic, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(p).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            (F.sum("lp") / F.count("*")).alias("avg_lp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round("avg_lp", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("avg_lp")), 4).alias("bigram_ppl"),
        )
    )


BIGRAM_LOGPROB_SQL = rf"""
WITH arrs AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS arr
    FROM documents
),
bi AS (
    SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
    FROM arrs, unnest(range(1, len(arr))) AS t(i)
),
toks AS (SELECT doc_id, unnest(arr) AS tok FROM arrs),
uni AS (SELECT tok, COUNT(*) AS c_tok FROM toks GROUP BY tok),
total AS (SELECT CAST(SUM(c_tok) AS DOUBLE) AS total FROM uni),
bic AS (SELECT w1, w2, COUNT(*) AS c_bi FROM bi GROUP BY 1, 2),
scored AS (
    SELECT b.doc_id,
           ln({BIGRAM_LAMBDA} * (CAST(c.c_bi AS DOUBLE) / u1.c_tok)
              + (1.0 - {BIGRAM_LAMBDA}) * (CAST(u2.c_tok AS DOUBLE) / total.total)) AS lp
    FROM bi b
    JOIN bic c ON b.w1 = c.w1 AND b.w2 = c.w2
    JOIN uni u1 ON b.w1 = u1.tok
    JOIN uni u2 ON b.w2 = u2.tok
    CROSS JOIN total
),
per_doc AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           SUM(lp) / COUNT(*) AS avg_lp
    FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       ROUND(avg_lp, 6) AS avg_logprob,
       ROUND(exp(-avg_lp), 4) AS bigram_ppl
FROM per_doc
"""


# --- corpus drift (history vs new batch) -------------------------------------

DRIFT_TOP_TERMS = 15


def q_corpus_drift(
    spark: SparkSession, sf_dir: str, vocab_checkpoint: bool = False
) -> DataFrame:
    """Distribution shift between the history half (even doc_id) and the
    incoming batch (odd doc_id — the dedup_incremental split contract):
    per-language doc share in each half, plus smoothed KL(batch‖history)
    over the word-unigram distribution and the batch's new-token rate.
    The monitoring query a continuously-ingesting pipeline runs before
    accepting a batch: a drifting source shows up as a language-share
    jump, a KL spike, or a surge of never-seen tokens.

    Output: one row per lang plus a ``__overall__`` row carrying the
    corpus-wide KL and new-token metrics (per-lang rows carry NULLs
    there — the union keeps the result a single relation).

    Plan shape: two scans (doc metadata for shares; token explode for
    KL), everything aggregates to |vocab| then to |langs|+1 rows before
    any join; the KL sum is one full-outer token join of two partial-
    agg'd count tables (co-partitioned on tok) — no corpus-sized state.
    Smoothing: add-1 on both sides over the UNION vocabulary, so the KL
    is finite even for tokens unique to one half; integer counts keep
    the expression tree engine-identical.
    """
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    half = F.when(F.col("doc_id") % 2 == 0, "history").otherwise("batch")
    shares = (
        docs.groupBy("lang")
        .agg(
            F.sum((F.col("doc_id") % 2 == 0).cast("long")).alias("hist_docs"),
            F.sum((F.col("doc_id") % 2 == 1).cast("long")).alias("batch_docs"),
        )
    )
    tot = docs.groupBy().agg(
        F.sum((F.col("doc_id") % 2 == 0).cast("long")).alias("th"),
        F.sum((F.col("doc_id") % 2 == 1).cast("long")).alias("tb"),
    )
    lang_rows = shares.crossJoin(F.broadcast(tot)).select(
        "lang",
        "hist_docs",
        "batch_docs",
        F.round(F.col("hist_docs") / F.col("th"), 6).alias("hist_share"),
        F.round(F.col("batch_docs") / F.col("tb"), 6).alias("batch_share"),
        F.lit(None).cast("double").alias("unigram_kl"),
        F.lit(None).cast("double").alias("new_token_rate"),
    )

    toks = docs.select(
        half.alias("half"),
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    )
    # |vocab|-sized and consumed twice (totals + the KL term stream); a
    # checkpoint here measured SLOWER at sf0.1 (1.1 → 1.4 s A/B: the
    # materialization barrier beats the re-run of a cheap tokenize) and
    # a wash at the 10× stand-in (r6 A/B below) — the double subtree
    # stays the default; ``vocab_checkpoint`` is the flip for corpora
    # where tokenize dominates
    counts = (
        toks.groupBy("tok")
        .agg(
            F.sum((F.col("half") == "history").cast("long")).alias("ch"),
            F.sum((F.col("half") == "batch").cast("long")).alias("cb"),
        )
    )
    if vocab_checkpoint:
        counts = counts.transform(materialize)
    vocab_tot = counts.groupBy().agg(
        F.sum("ch").alias("nh"),
        F.sum("cb").alias("nb"),
        F.count("*").alias("v"),
        F.sum((F.col("ch") == 0).cast("long")).alias("new_types"),
        F.sum(F.when(F.col("ch") == 0, F.col("cb")).otherwise(0)).alias("new_toks"),
    )
    # add-1 smoothing over the union vocabulary on both sides
    withp = counts.crossJoin(F.broadcast(vocab_tot)).select(
        (
            ((F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("v")))
            * F.log(
                ((F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("v")))
                / ((F.col("ch") + 1).cast("double") / (F.col("nh") + F.col("v")))
            )
        ).alias("term"),
        "nb",
        "new_toks",
        "new_types",
    )
    overall = withp.groupBy().agg(
        F.round(F.sum("term"), 6).alias("unigram_kl"),
        F.round(F.first("new_toks") / F.first("nb"), 6).alias("new_token_rate"),
    )
    overall_row = overall.select(
        F.lit("__overall__").alias("lang"),
        F.lit(None).cast("long").alias("hist_docs"),
        F.lit(None).cast("long").alias("batch_docs"),
        F.lit(None).cast("double").alias("hist_share"),
        F.lit(None).cast("double").alias("batch_share"),
        "unigram_kl",
        "new_token_rate",
    )
    return lang_rows.unionByName(overall_row)


CORPUS_DRIFT_SQL = r"""
WITH shares AS (
    SELECT lang,
           SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS hist_docs,
           SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS batch_docs
    FROM documents GROUP BY lang
),
tot AS (
    SELECT SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS th,
           SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS tb
    FROM documents
),
toks AS (
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'history' ELSE 'batch' END AS half,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
    FROM documents
),
counts AS (
    SELECT tok,
           SUM(CASE WHEN half = 'history' THEN 1 ELSE 0 END) AS ch,
           SUM(CASE WHEN half = 'batch' THEN 1 ELSE 0 END) AS cb
    FROM toks GROUP BY tok
),
vocab_tot AS (
    SELECT SUM(ch) AS nh, SUM(cb) AS nb, COUNT(*) AS v,
           SUM(CASE WHEN ch = 0 THEN 1 ELSE 0 END) AS new_types,
           SUM(CASE WHEN ch = 0 THEN cb ELSE 0 END) AS new_toks
    FROM counts
),
overall AS (
    SELECT ROUND(SUM((CAST(cb + 1 AS DOUBLE) / (nb + v))
                     * ln((CAST(cb + 1 AS DOUBLE) / (nb + v))
                          / (CAST(ch + 1 AS DOUBLE) / (nh + v)))), 6) AS unigram_kl,
           ROUND(CAST(ANY_VALUE(new_toks) AS DOUBLE) / ANY_VALUE(nb), 6)
               AS new_token_rate
    FROM counts CROSS JOIN vocab_tot
)
SELECT lang,
       CAST(hist_docs AS BIGINT) AS hist_docs,
       CAST(batch_docs AS BIGINT) AS batch_docs,
       ROUND(CAST(hist_docs AS DOUBLE) / th, 6) AS hist_share,
       ROUND(CAST(batch_docs AS DOUBLE) / tb, 6) AS batch_share,
       CAST(NULL AS DOUBLE) AS unigram_kl,
       CAST(NULL AS DOUBLE) AS new_token_rate
FROM shares CROSS JOIN tot
UNION ALL
SELECT '__overall__', NULL, NULL, NULL, NULL, unigram_kl, new_token_rate
FROM overall
"""


# --- ANALYZE-style column profiling ------------------------------------------

_PROFILE_COLS = ("doc_id", "source", "lang", "n_chars", "text")


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of the documents table: null count, exact
    distinct count, min and max (rendered to strings) — the ANALYZE /
    data-quality report every warehouse keeps per table, and the input
    to data-contract drift alerts (a ndv collapse or a min/max shift is
    a broken upstream join or a new source).

    Scale shape: ONE pass — all per-column aggregates fuse into a single
    two-phase hash aggregate (count_distinct expands per column but
    stays partial-combined); the long-form reshape afterwards is a
    row-local stack of the 1-row wide result. At 100 TB swap the exact
    count_distinct for approx_count_distinct — same single-pass plan
    shape. min/max render via the same explicit formats in both engines
    (timestamps as 'yyyy-MM-dd HH:mm:ss', numbers as plain decimal
    strings), so the hash is representation-stable.
    """
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    # Aggregate the RAW column, render the 1-row result afterwards:
    # MIN over a string-rendered numeric is lexicographic (min{23,100} =
    # '100'), so the profile would feed wrong extremes to drift alerts.
    def render(col: F.Column, c: str) -> F.Column:
        dt = dict(docs.dtypes)[c]
        if dt.startswith("timestamp"):
            return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
        return col.cast("string")

    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(c).alias(f"{c}__ndv"),
            render(F.min(F.col(c)), c).alias(f"{c}__min"),
            render(F.max(F.col(c)), c).alias(f"{c}__max"),
        ]
    wide = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__ndv, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
        ).alias("column", "n_nulls", "n_distinct", "min_value", "max_value")
    )


def table_profile_sql() -> str:
    per_col = []
    for c in _PROFILE_COLS:
        per_col.append(
            f"SELECT '{c}' AS column,"
            f" CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" CAST(MIN({c}) AS VARCHAR) AS min_value,"
            f" CAST(MAX({c}) AS VARCHAR) AS max_value FROM documents"
        )
    return "\nUNION ALL\n".join(per_col)
