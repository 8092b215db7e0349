"""Semantics of the linear quality classifiers on crafted documents."""

import pytest

from graphdb_neo4j_spark.llmdata import classifier


@pytest.fixture(scope="module")
def crafted(spark, tmp_path_factory):
    docs = [
        (1, "The history of the region and the growth of its towns is told in a measured and careful way.", "en", "src0", 0),
        (2, "click subscribe free buy sale winner casino spam click www com login password", "en", "src0", 0),
        (3, "a b c d e f g h i j", "en", "src0", 0),  # no vocab hits → bias only
    ]
    d = tmp_path_factory.mktemp("clf")
    spark.createDataFrame(
        docs, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


def test_prose_scores_above_spam(spark, crafted):
    rows = {r["doc_id"]: r for r in classifier.q_quality_classifier(spark, crafted).collect()}
    assert rows[1]["quality_score"] > 0.5 and rows[1]["keep"]
    assert rows[2]["quality_score"] < 0.5 and not rows[2]["keep"]
    assert rows[1]["quality_score"] > rows[2]["quality_score"]


def test_no_hit_doc_gets_bias_prior(spark, crafted):
    rows = {r["doc_id"]: r for r in classifier.q_quality_classifier(spark, crafted).collect()}
    assert rows[3]["n_vocab_hits"] == 1  # "a" is in the vocabulary
    # bias + one weak positive over 10 tokens → barely above neutral
    assert 0.5 < rows[3]["quality_score"] < 0.8


def test_hashed_scorer_is_order_invariant(spark, crafted):
    base = {
        r["doc_id"]: r["quality_score"]
        for r in classifier.q_quality_classifier_hashed(spark, crafted).collect()
    }
    docs = [(10, "alpha beta gamma delta", "en", "s", 0), (11, "delta gamma beta alpha", "en", "s", 0)]
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, schema="doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        rows = {
            r["doc_id"]: r["quality_score"]
            for r in classifier.q_quality_classifier_hashed(spark, d).collect()
        }
    assert rows[10] == rows[11]  # bag-of-words: permutation cannot move the score
    assert set(base) == {1, 2, 3}


def test_hashed_bucket_weights_bounded(spark, crafted):
    # every bucket weight lies in [-1000, 1000] milli → |mean| ≤ 1 → score in
    # the open sigmoid(±8) band, never saturated to exactly 0/1
    for r in classifier.q_quality_classifier_hashed(spark, crafted).collect():
        assert 0.000335 < r["quality_score"] < 0.999665


def test_quality_gate_keeps_the_budgeted_fraction(spark, sf_correct):
    from graphdb_neo4j_spark.llmdata.classifier import q_quality_gate

    rows = q_quality_gate(spark, sf_correct, keep_frac=0.6).collect()
    n = len(rows)
    kept = sum(r["kept"] for r in rows)
    # quantile cut keeps the budget up to score ties at the threshold
    assert 0.55 * n <= kept <= 0.7 * n
    thr = rows[0]["threshold"]
    for r in rows:
        assert r["kept"] == (r["quality_score"] >= thr)
    # every kept doc scores >= every dropped doc's score... at the boundary
    assert min(r["quality_score"] for r in rows if r["kept"]) >= max(
        (r["quality_score"] for r in rows if not r["kept"]), default=0.0
    )


# --- DSIR importance weights ---------------------------------------------------


@pytest.fixture(scope="module")
def dsir_corpus(spark, tmp_path_factory):
    """Two disjoint vocabularies: target docs speak A, the bulk speaks B.
    A scoring doc written purely in A must get a POSITIVE log weight
    (looks like the target), purely in B a NEGATIVE one."""
    a = "alpha beta gamma delta epsilon"
    b = "zulu yankee xray whiskey victor"
    docs = [
        (1, a, "en", "tgt", 0),
        (2, a, "en", "tgt", 0),
        (3, b, "en", "web", 0),
        (4, b, "en", "web", 0),
        (5, b, "en", "web", 0),
        (6, a, "en", "web", 0),   # an A-speaking doc hiding in the raw pool
        (7, b + " " + b, "en", "web", 0),
    ]
    d = tmp_path_factory.mktemp("dsir")
    spark.createDataFrame(
        docs, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


def test_dsir_separates_disjoint_vocabularies(spark, dsir_corpus):
    rows = {
        r["doc_id"]: r
        for r in classifier.q_dsir_weights(
            spark, dsir_corpus, target_source="tgt", buckets=64
        ).collect()
    }
    assert len(rows) == 7
    for did in (1, 2, 6):   # A-vocabulary docs rank above every B doc
        for bid in (3, 4, 5, 7):
            assert rows[did]["log_weight"] > rows[bid]["log_weight"]
    assert rows[6]["log_weight"] > 0   # looks like the target (buckets=64
    # keeps the smoothing mass λB small next to the 10-token target fit;
    # at the 256-bucket default this tiny corpus is smoothing-dominated)
    assert rows[3]["log_weight"] < 0   # looks like the raw pool
    # identical text ⇒ identical weight regardless of which pool it sat in
    assert rows[1]["log_weight"] == rows[6]["log_weight"]


def test_dsir_matches_python_replay(spark, dsir_corpus):
    """Exact replay of the smoothed hashed-unigram formula in Python,
    including the md5-prefix bucketing."""
    import hashlib
    import math
    import re

    docs = {
        r["doc_id"]: (r["text"], r["source"])
        for r in spark.read.parquet(f"{dsir_corpus}/documents.parquet").collect()
    }
    B, lam, tgt_src = 64, classifier.DSIR_LAMBDA, "tgt"

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    c_t: dict = {}
    c_r: dict = {}
    per_doc: dict = {}
    for did, (text, src) in docs.items():
        bks = [bucket(t) for t in re.findall(r"[a-z]+", text.lower())]
        per_doc[did] = bks
        for bk in bks:
            c_r[bk] = c_r.get(bk, 0) + 1
            if src == tgt_src:
                c_t[bk] = c_t.get(bk, 0) + 1
    n_t, n_r = sum(c_t.values()), sum(c_r.values())

    def lr(bk):
        return math.log((c_t.get(bk, 0) + lam) / (n_t + lam * B)) - math.log(
            (c_r.get(bk, 0) + lam) / (n_r + lam * B)
        )

    got = {
        r["doc_id"]: r
        for r in classifier.q_dsir_weights(
            spark, dsir_corpus, target_source=tgt_src, buckets=B
        ).collect()
    }
    for did, bks in per_doc.items():
        want = sum(lr(b) for b in bks)
        assert got[did]["n_tokens"] == len(bks)
        assert got[did]["log_weight"] == pytest.approx(want, abs=1e-6)
        assert got[did]["avg_log_ratio"] == pytest.approx(want / len(bks), abs=1e-8)
