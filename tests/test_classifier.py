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
