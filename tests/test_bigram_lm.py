"""The bigram LM must punish improbable transitions that a unigram model
cannot see."""

import pytest

from graphdb_neo4j_spark.llmdata import textstats

SENT = "the cat sat on the mat and the dog sat on the rug"


@pytest.fixture(scope="module")
def salad_corpus(spark, tmp_path_factory):
    """Many fluent docs fix the corpus statistics; one doc is the same
    unigram bag in scrambled order (deterministic rotation-interleave)."""
    words = SENT.split()
    scrambled = " ".join(words[::2] + words[1::2][::-1])
    rows = [(i, SENT, "en", "s", len(SENT)) for i in range(20)]
    rows.append((100, scrambled, "en", "s", len(scrambled)))
    d = tmp_path_factory.mktemp("blm")
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    return str(d)


def test_scrambled_doc_scores_below_fluent(spark, salad_corpus):
    bi = {r["doc_id"]: r for r in textstats.q_bigram_logprob(spark, salad_corpus).collect()}
    uni = {r["doc_id"]: r for r in textstats.q_unigram_logprob(spark, salad_corpus).collect()}
    # same unigram bag → unigram model cannot separate them
    assert uni[100]["avg_logprob"] == uni[0]["avg_logprob"]
    # bigram model must: scrambled transitions are rare in the corpus
    assert bi[100]["avg_logprob"] < bi[0]["avg_logprob"]
    assert bi[100]["bigram_ppl"] > 2 * bi[0]["bigram_ppl"]


def test_single_token_docs_drop_out(spark, tmp_path):
    rows = [(1, "hello", "en", "s", 5), (2, "hello world", "en", "s", 11)]
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in textstats.q_bigram_logprob(spark, str(tmp_path)).collect()}
    assert set(out) == {2}
    assert out[2]["n_bigrams"] == 1


def test_corpus_drift_detects_injected_shift(spark, tmp_path):
    """history = english prose; batch = half same, half a new vocabulary —
    the overall row must show a clearly positive KL and new-token rate,
    and the language shares must reflect the injected lang flip."""
    from graphdb_neo4j_spark.llmdata import textstats

    rows = []
    for i in range(0, 40, 2):  # history: even ids, english
        rows.append((i, "the quick brown fox jumps over the lazy dog", "en", "s", 43))
    for i in range(1, 20, 2):  # batch part 1: same distribution
        rows.append((i, "the quick brown fox jumps over the lazy dog", "en", "s", 43))
    for i in range(21, 40, 2):  # batch part 2: drifted source, new tokens
        rows.append((i, "zzq wvx qqj kkp zzq wvx mmr ttb", "de", "s", 31))
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    out = {r["lang"]: r for r in textstats.q_corpus_drift(spark, str(tmp_path)).collect()}
    ov = out["__overall__"]
    assert ov["unigram_kl"] > 0.5  # half the batch mass sits on unseen tokens
    assert ov["new_token_rate"] > 0.3
    assert out["en"]["hist_share"] == 1.0
    assert out["de"]["hist_docs"] == 0 and out["de"]["batch_docs"] == 10
