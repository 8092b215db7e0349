"""U3 — GraphService boundary marshalling + write-path visibility."""

from pyspark.sql import functions as F

from graphdb_neo4j_spark.api import GraphService, StudentCreate


def _svc(spark, sf_dir):
    return GraphService(spark, sf_dir)


def test_ping_and_reads(spark, sf_dir):
    svc = _svc(spark, sf_dir)
    assert svc.ping()

    detail = svc.get_student_by_id(42)
    assert detail is not None and detail.id == 42
    assert detail.name.startswith("customer#")
    assert isinstance(detail.interests, tuple)

    assert svc.student_exists(42)
    assert not svc.student_exists(10**9)

    names = svc.get_all_student_names()
    assert detail.name in names


def test_recommend_and_search_marshalling(spark, sf_dir):
    svc = _svc(spark, sf_dir)
    recs = svc.recommend_people(1, limit=5)
    assert len(recs) == 5
    assert all(recs[i].score >= recs[i + 1].score for i in range(len(recs) - 1))

    matches = svc.search_students("customer#000000042", threshold=50.0, limit=3)
    assert matches and matches[0].id == 42 and matches[0].score == 100.0


def test_relationship_summary(spark, sf_dir):
    svc = _svc(spark, sf_dir)
    rel = svc.relationship("Customer#000000042", "Customer#000000043")
    assert rel is not None
    assert set(rel.rel_types) <= {
        "SAME_COLLEGE", "SAME_BOARD", "SAME_STREAM", "NEARBY", "SHARES_INTEREST",
    }


def test_save_student_visibility(spark, sf_dir):
    svc = _svc(spark, sf_dir)
    before = svc.get_all_student_names()
    new_id = svc.save_student(
        StudentCreate(
            name="  Test Person  ",
            address="addr_5",
            college="CANADA",
            board="AMERICA",
            stream="BUILDING",
            interests=("42", "100"),
        )
    )
    # id allocation: MAX(id)+1 over the visible node set
    assert svc.student_exists(new_id)
    detail = svc.get_student_by_id(new_id)
    assert detail is not None and detail.name == "test person"
    assert "test person" in svc.get_all_student_names()
    assert len(svc.get_all_student_names()) == len(before) + 1

    # second save allocates the next id
    second = svc.save_student(StudentCreate(name="Another Person"))
    assert second == new_id + 1

    # incremental edges for the overlay batch are derivable and typed
    edge_types = {
        r["type"] for r in svc.new_edges_for_overlay().select("type").distinct().collect()
    }
    assert edge_types <= {
        "SAME_COLLEGE", "SAME_BOARD", "SAME_STREAM", "NEARBY", "SHARES_INTEREST",
    }


def test_backfill_edges(spark, sf_dir):
    svc = _svc(spark, sf_dir)
    counts = {
        r["type"]: r["n"]
        for r in svc.backfill_edges().groupBy("type").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {
        "SAME_COLLEGE", "SAME_BOARD", "SAME_STREAM", "NEARBY", "SHARES_INTEREST",
    }
    assert all(v > 0 for v in counts.values())


def test_chat_template_paths(spark, sf_dir):
    svc = _svc(spark, sf_dir)
    reply = svc.chat("who is Customer#000000042?")
    assert "customer#000000042" in reply
    assert svc.chat("hi")  # chat path without an LLM returns the canned line
