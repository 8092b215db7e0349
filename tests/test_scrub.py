"""PII scrubbing + n-gram decontamination: crafted-input semantics (the
fixture text contains no PII spans, which would exercise nothing) and
overlap invariants."""

from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata import scrub


def test_pii_counts_and_redaction(spark):
    text = (
        "mail a@b.com or c.d+x@e.org, call 555-123-4567, "
        "see https://example.com/x?y=1 and http://t.co"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = df.select(
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(scrub.EMAIL_RE), F.lit(0))
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all("text", F.lit(scrub.URL_RE), F.lit(0))
        ).alias("n_urls"),
        F.size(
            F.regexp_extract_all("text", F.lit(scrub.PHONE_RE), F.lit(0))
        ).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), scrub.EMAIL_RE, "<EMAIL>"),
                scrub.URL_RE,
                "<URL>",
            ),
            scrub.PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
    ).collect()[0]
    assert row["n_emails"] == 2
    assert row["n_urls"] == 2
    assert row["n_phones"] == 1
    assert "<EMAIL>" in row["redacted"] and "a@b.com" not in row["redacted"]
    assert "<PHONE>" in row["redacted"] and "555-123-4567" not in row["redacted"]
    assert "<URL>" in row["redacted"] and "example.com" not in row["redacted"]


def test_pii_scrub_runs_on_fixture(spark, sf_dir):
    out = scrub.q_pii_scrub(spark, sf_dir)
    assert out.columns == [
        "doc_id", "n_emails", "n_urls", "n_phones", "redacted_hash",
    ]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert out.count() == n_docs


def test_word_ngrams_short_docs_contribute_nothing(spark):
    df = spark.createDataFrame(
        [(1, "only four words here"), (2, " ".join(f"w{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    grams = scrub.word_ngrams(df, width=13)
    rows = grams.collect()
    assert all(r["doc_id"] == 2 for r in rows)
    assert len(rows) == 20 - 13 + 1
    assert all(len(r["gram"].split(" ")) == 13 for r in rows)


def test_contamination_flags_verbatim_copy(spark, tmp_path):
    """A doc that copies a benchmark doc verbatim must collide on every
    one of its grams; an unrelated doc must not appear."""
    bench_text = " ".join(f"b{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (0, bench_text, "en", "s", len(bench_text)),
            (100, bench_text, "en", "s", len(bench_text)),
            (101, " ".join(f"z{i}" for i in range(30)), "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    # point the query at the temp dir via its _docs loader contract
    out = {
        r["doc_id"]: r["n_contaminated_ngrams"]
        for r in scrub.q_contamination(spark, str(tmp_path)).collect()
    }
    assert out == {100: 30 - 13 + 1}


def test_domain_stats_on_crafted_urls(spark, tmp_path):
    from graphdb_neo4j_spark.llmdata.scrub import q_domain_stats

    rows = [
        (1, "see https://example.com/a and http://example.com/b too", "en", "s", 0),
        (2, "only Https://Sub.Example.ORG/page here", "en", "s", 0),
        (3, "no links at all", "en", "s", 0),
        (4, "again https://example.com once", "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r["domain"]: (r["n_docs"], r["n_mentions"]) for r in q_domain_stats(spark, str(tmp_path)).collect()}
    assert got["example.com"] == (2, 3)  # docs 1 and 4; 3 mentions
    assert got["sub.example.org"] == (1, 1)  # lowercased host
    assert len(got) == 2  # doc 3 contributes nothing


def test_contamination_neardup_catches_paraphrase_exact_misses(spark, tmp_path):
    """The paraphrase channel's reason to exist (r12 debut): a benchmark
    doc reworded once every ~12 tokens defeats the exact 13-TOKEN-gram
    check (zero surviving 13-grams) but keeps most of its 10-CHAR
    shingle Jaccard — contamination_neardup must flag it with the exact
    value a pure-Python w-shingling reference computes, q_contamination
    must not, and an unrelated doc must pass both."""
    import re

    from graphdb_neo4j_spark.llmdata.scrub import (
        NEARDUP_CONTAM_WIDTH,
        q_contamination,
        q_contamination_neardup,
    )

    bench_toks = [f"word{i}" for i in range(30)]
    para_toks = list(bench_toks)
    para_toks[6], para_toks[18] = "xxxx6", "xxxx18"  # every 13-window hit
    bench_text = " ".join(bench_toks)
    para_text = " ".join(para_toks)
    rows = [
        (0, bench_text, "en", "bench", 0),
        (100, para_text, "en", "s", 0),
        (101, " ".join(f"zebra{i}" for i in range(30)), "en", "s", 0),
    ]
    spark.createDataFrame(
        rows,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")

    exact = {r.doc_id for r in q_contamination(spark, str(tmp_path)).collect()}
    assert 100 not in exact  # the evasion the exact channel admits

    def shingles(text, w=NEARDUP_CONTAM_WIDTH):
        t = re.sub(r"\s+", " ", text.strip().lower())
        return {t[i : i + w] for i in range(len(t) - w + 1)}

    sa, sb = shingles(bench_text), shingles(para_text)
    expected_j = round(len(sa & sb) / len(sa | sb), 6)
    assert expected_j >= 0.5, "fixture must clear the default threshold"

    near = {
        (r.bench_id, r.corpus_id): r.jaccard
        for r in q_contamination_neardup(spark, str(tmp_path)).collect()
    }
    assert set(near) == {(0, 100)}
    assert near[(0, 100)] == expected_j

    # remediation forms: the exact-channel complement KEEPS the evader
    # (the gap), the union remediation drops it; the unrelated doc and
    # no benchmark doc appear in either
    from graphdb_neo4j_spark.llmdata.scrub import (
        q_decontaminated,
        q_decontaminated_full,
    )

    exact_clean = {
        r.doc_id for r in q_decontaminated(spark, str(tmp_path)).collect()
    }
    full_clean = {
        r.doc_id for r in q_decontaminated_full(spark, str(tmp_path)).collect()
    }
    assert exact_clean == {100, 101}  # evader survives the verbatim channel
    assert full_clean == {101}  # the union remediation closes the gap


def test_contamination_semantic_catches_rewording_lexical_misses(spark, tmp_path):
    """The semantic channel's reason to exist (r13 debut, VERDICT r12
    #4): a benchmark item REWORDED wholesale shares no 13-token gram and
    no 10-char shingle with the original — both lexical channels pass it
    — but its embedding still sits next to the benchmark embedding.
    Only contamination_semantic flags it; decontaminated_full (lexical
    union) keeps it, decontaminated_semantic drops it; an unrelated doc
    with an orthogonal embedding passes every channel."""
    import re

    from graphdb_neo4j_spark.llmdata.scrub import (
        NEARDUP_CONTAM_WIDTH,
        q_contamination,
        q_contamination_neardup,
        q_contamination_semantic,
        q_decontaminated_full,
        q_decontaminated_semantic,
    )

    bench_text = " ".join(f"alpha{i}" for i in range(30))
    # full rewording: zero lexical overlap with the benchmark item
    evader_text = " ".join(f"omega{i}" for i in range(30))
    control_text = " ".join(f"zebra{i}" for i in range(30))
    rows = [
        (0, bench_text, "en", "bench", 0),
        (100, evader_text, "en", "s", 0),
        (101, control_text, "en", "s", 0),
    ]
    spark.createDataFrame(
        rows,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    # embedding sidecar (vec_id = doc_id): the evader's embedding is the
    # benchmark's (a perfect paraphrase); the control is orthogonal
    e_bench = [1.0, 0.0, 0.0, 0.0]
    e_control = [0.0, 1.0, 0.0, 0.0]
    spark.createDataFrame(
        [(0, e_bench, 0), (100, e_bench, 1), (101, e_control, 1)],
        schema="vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{tmp_path}/embeddings.parquet")

    # both lexical channels pass the evader
    exact = {r.doc_id for r in q_contamination(spark, str(tmp_path)).collect()}
    assert 100 not in exact

    def shingles(text, w=NEARDUP_CONTAM_WIDTH):
        t = re.sub(r"\s+", " ", text.strip().lower())
        return {t[i : i + w] for i in range(len(t) - w + 1)}

    sa, sb = shingles(bench_text), shingles(evader_text)
    assert len(sa & sb) / len(sa | sb) < 0.5, "fixture must evade the shingle bar"
    near = {
        r.corpus_id
        for r in q_contamination_neardup(spark, str(tmp_path)).collect()
    }
    assert 100 not in near

    # only the semantic channel flags it
    sem = {
        (r.bench_id, r.corpus_id): r.cosine
        for r in q_contamination_semantic(spark, str(tmp_path)).collect()
    }
    assert set(sem) == {(0, 100)}
    assert sem[(0, 100)] == 1.0

    # remediation forms: the lexical union KEEPS the evader (the gap),
    # the three-channel remediation closes it; the control survives both
    full_clean = {
        r.doc_id for r in q_decontaminated_full(spark, str(tmp_path)).collect()
    }
    sem_clean = {
        r.doc_id
        for r in q_decontaminated_semantic(spark, str(tmp_path)).collect()
    }
    assert full_clean == {100, 101}
    assert sem_clean == {101}
    assert sem_clean <= full_clean  # always a subset, by construction


def test_contamination_semantic_lsh_refines_exact(spark, sf_correct):
    """The bucketed scale twin (r13): every emitted pair must be an
    exact-channel pair with the identical cosine (precision 1.0 —
    candidates are exact-verified), and recall vs the exhaustive
    bench×corpus form must clear the documented floor in this corpus's
    near-orthogonal hard regime."""
    exact = {
        (r.bench_id, r.corpus_id): r.cosine
        for r in scrub.q_contamination_semantic(spark, sf_correct).collect()
    }
    got = {
        (r.bench_id, r.corpus_id): r.cosine
        for r in scrub.q_contamination_semantic_lsh(spark, sf_correct).collect()
    }
    assert set(got) <= set(exact)
    for pair, cos in got.items():
        assert cos == exact[pair]
    recall = len(got) / len(exact)
    assert recall >= 0.8, f"LSH contamination recall {recall} below 0.8"


def test_contamination_semantic_lsh_never_misses_identical_embedding(spark, tmp_path):
    """Identical embeddings agree on every hyperplane, so a
    verbatim-embedding contamination (the semantic channel's canonical
    target) collides in EVERY table — it cannot be missed at any LSH
    parameters."""
    import random

    from graphdb_neo4j_spark.llmdata import simsearch

    rnd = random.Random(11)
    base = [rnd.gauss(0, 1) for _ in range(simsearch.DIM)]
    n = sum(x * x for x in base) ** 0.5
    unit = [x / n for x in base]
    other = [rnd.gauss(0, 1) for _ in range(simsearch.DIM)]
    m = sum(x * x for x in other) ** 0.5
    rows = [(0, unit, 0), (100, unit, 1), (101, [x / m for x in other], 1)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    got = {
        (r.bench_id, r.corpus_id)
        for r in scrub.q_contamination_semantic_lsh(
            spark, str(tmp_path), threshold=0.99
        ).collect()
    }
    assert (0, 100) in got


def test_contamination_report_channel_attribution(spark, tmp_path):
    """The dashboard rollup (r13): one crafted doc per channel — a
    verbatim copy (exact + paraphrase), a light paraphrase (paraphrase
    only), a semantic evader (semantic only), and a clean doc — must
    produce exactly the per-channel flagged counts plus the distinct
    union."""
    from graphdb_neo4j_spark.llmdata.scrub import q_contamination_report

    bench_toks = [f"alpha{i}" for i in range(30)]
    para_toks = list(bench_toks)
    para_toks[6], para_toks[18] = "xxxx6", "xxxx18"  # kills every 13-gram
    rows = [
        (0, " ".join(bench_toks), "en", "bench", 0),
        (100, " ".join(bench_toks), "en", "s", 0),   # verbatim copy
        (101, " ".join(para_toks), "en", "s", 0),    # paraphrase only
        (102, " ".join(f"omega{i}" for i in range(30)), "en", "s", 0),  # semantic only
        (103, " ".join(f"zeta{i}" for i in range(30)), "en", "s", 0),   # clean
    ]
    spark.createDataFrame(
        rows,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    e_bench = [1.0, 0.0, 0.0, 0.0]
    e_other = [0.0, 1.0, 0.0, 0.0]
    spark.createDataFrame(
        [(0, e_bench, 0), (102, e_bench, 1), (103, e_other, 1)],
        schema="vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{tmp_path}/embeddings.parquet")

    got = {
        r.channel: r.n_flagged
        for r in q_contamination_report(spark, str(tmp_path)).collect()
    }
    assert got == {
        "exact": 1,       # 100
        "paraphrase": 2,  # 100 (jaccard 1.0) + 101
        "semantic": 1,    # 102
        "union": 3,       # distinct {100, 101, 102}
    }
