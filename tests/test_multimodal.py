"""Multimodal column plumbing: binary payloads through Arrow batches, the
decode seam, deterministic fake-decode, modality pruning."""

import pytest

from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata import multimodal


@pytest.mark.skipif(
    multimodal.pillow_available(), reason="pillow installed: seam is live"
)
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


def test_asset_features_exact_values(spark):
    """Pin the feature kernel on a crafted payload: Spark output must
    equal a pure-Python computation byte for byte."""
    import numpy as np

    payload = bytes([10, 200, 10, 30])
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "asset_id long, payload binary"
    )
    [row] = df.mapInPandas(
        multimodal.extract_features_batches, multimodal.FEATURES_SCHEMA
    ).collect()
    a = np.frombuffer(payload, dtype=np.uint8)
    expected = [
        4.0, float(a.mean()), float(a.std()), 10.0, 200.0, 10.0, 30.0, 3.0,
    ]
    assert row["features"] == pytest.approx(expected, rel=1e-6)


def test_asset_features_shape_and_determinism(spark, sf_dir):
    feats = multimodal.q_asset_features(spark, sf_dir)
    rows1 = sorted((r["asset_id"], tuple(r["features"])) for r in feats.collect())
    rows2 = sorted(
        (r["asset_id"], tuple(r["features"]))
        for r in multimodal.q_asset_features(spark, sf_dir).collect()
    )
    assert rows1 == rows2
    assert all(len(f) == multimodal.FEATURE_DIM for _, f in rows1)


@pytest.mark.skipif(
    multimodal.pillow_available(), reason="pillow installed: seam is live"
)
def test_resize_seam_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.resize_image(b"\x89PNG...", 128, 96)


@pytest.mark.skipif(
    not multimodal.pillow_available(),
    reason="pillow not installed in this container",
)
def test_real_decode_and_resize_match_contract(spark):
    """Pillow-gated real-codec twin: generated PNGs through the SAME
    mapInPandas plan as q_image_meta must yield q_image_meta's contract
    columns with the ACTUAL pixel dimensions, and resize_image must
    produce a decodable image of exactly the planned target size."""
    import io

    from PIL import Image

    payloads = {}
    for asset_id, (w, h) in [(1, (5, 3)), (2, (300, 120))]:
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (10 * asset_id, 0, 0)).save(buf, format="PNG")
        payloads[asset_id] = buf.getvalue()
    df = spark.createDataFrame(
        [
            (aid, "image", bytearray(p), len(p))
            for aid, p in payloads.items()
        ],
        "asset_id long, modality string, payload binary, n_bytes long",
    )
    out = multimodal.image_meta_real(df)
    # exact q_image_meta output contract
    assert out.columns == ["asset_id", "width", "height", "n_bytes"]
    got = {
        r["asset_id"]: (r["width"], r["height"], r["n_bytes"])
        for r in out.collect()
    }
    assert got == {
        1: (5, 3, len(payloads[1])),
        2: (300, 120, len(payloads[2])),
    }
    # pixel resize honors the aspect-fit plan targets (300×120 → 256×102)
    resized = multimodal.resize_image(payloads[2], 256, 102)
    assert Image.open(io.BytesIO(resized)).size == (256, 102)


def test_resize_plan_invariants(spark, sf_dir):
    plan = multimodal.q_image_resize_plan(spark, sf_dir)
    rows = plan.collect()
    assert rows
    for r in rows:
        long_side = max(r["target_w"], r["target_h"])
        if r["is_noop"]:
            assert (r["target_w"], r["target_h"]) == (r["width"], r["height"])
        else:
            assert long_side == multimodal.RESIZE_BOX  # long side lands on box
        assert r["target_w"] <= r["width"] and r["target_h"] <= r["height"]


def test_frame_sample_stride(spark, sf_dir):
    frames = multimodal.q_frame_sample(spark, sf_dir, every_n_frames=48)
    bad = frames.filter(
        (F.col("frame_idx") % 48 != 0) | (F.col("frame_idx") >= F.col("n_frames"))
    )
    assert bad.count() == 0
