"""Multimodal column plumbing: binary payloads through Arrow batches, the
decode seam, deterministic fake-decode, modality pruning."""

import pytest

from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata import multimodal


def test_decode_seam_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG...")


def test_fake_decode_deterministic_and_bounded():
    w1, h1 = multimodal.fake_decode_meta(b"abc")
    w2, h2 = multimodal.fake_decode_meta(b"abc")
    assert (w1, h1) == (w2, h2)
    assert 1 <= w1 <= 4096 and 1 <= h1 <= 4096
    assert multimodal.fake_decode_meta(b"abcd") != (w1, h1)


def test_assets_cover_all_modalities(spark, sf_dir):
    assets = multimodal.assets_table(spark, sf_dir)
    assert assets.schema["payload"].dataType.typeName() == "binary"
    mods = {r["modality"] for r in assets.select("modality").distinct().collect()}
    assert mods == set(multimodal.MODALITIES)


def test_image_meta_runs_through_map_in_pandas(spark, sf_dir):
    assets = multimodal.assets_table(spark, sf_dir)
    n_images = assets.filter(F.col("modality") == "image").count()
    meta = multimodal.q_image_meta(spark, sf_dir)
    rows = meta.collect()
    assert len(rows) == n_images
    assert meta.columns == ["asset_id", "width", "height", "n_bytes"]
    # kernel output is the deterministic fake over payload byte length
    sample = rows[0]
    w, h = (
        sample["n_bytes"] * multimodal._W_MULT % multimodal._DIM_MOD + 1,
        sample["n_bytes"] * multimodal._H_MULT % multimodal._DIM_MOD + 1,
    )
    assert (sample["width"], sample["height"]) == (w, h)


def test_frame_sample_stride(spark, sf_dir):
    frames = multimodal.q_frame_sample(spark, sf_dir, every_n_frames=48)
    bad = frames.filter(
        (F.col("frame_idx") % 48 != 0) | (F.col("frame_idx") >= F.col("n_frames"))
    )
    assert bad.count() == 0
