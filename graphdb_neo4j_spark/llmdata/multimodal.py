"""Multimodal column operators — image/audio/video treated as opaque
``binary`` payload columns with typed metadata, the fourth
training-data-pipeline family (alongside dedup / similarity / text stats).

The testdata has no binary fixture, so the asset table is DERIVED
deterministically from ``documents`` (payload = utf-8 bytes of the text,
modality assigned round-robin by doc_id, metadata from byte length) — the
derivation is mirrored exactly in the DuckDB oracles, so every operator
here is hash-checked, including the Pandas-UDF decode path.

Decode seams: :func:`decode_image` / :func:`resize_image` are
PILLOW-GATED (the operators/merge_delta discipline) — real
``PIL.Image`` decode/resize where pillow is importable, and
NotImplementedError at the exact plug-in point where it isn't (this
container ships no image/audio libs). The registered queries use
:func:`fake_decode_meta` — a deterministic arithmetic stand-in the
DuckDB oracle mirrors — so the Spark-side plumbing that actually matters
at 100 TB (binary columns through Arrow batches, ``mapInPandas`` schema
contract, per-modality partition pruning, metadata explode) is real and
oracle-tested; :func:`image_meta_real` is the same plan over the real
decoder, pinned by a pillow-gated pytest on a generated PNG.

Scale notes: payloads never pass through a shuffle — every operator
filters/projects first (modality predicate pushes down to the scan) and
aggregates only scalar metadata. ``mapInPandas`` streams Arrow batches;
batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
so executor memory holds batch_size × max_payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.session import widen_scan

MODALITIES = ("image", "audio", "video")

# Deterministic fake-decode parameters (mirrored in the SQL oracles).
_W_MULT, _H_MULT, _DIM_MOD = 7919, 104729, 4096
_FPS = 24
_MS_PER_BYTE = 13


def assets_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(asset_id, modality, payload BINARY, n_bytes, duration_ms) — the
    opaque-payload-plus-typed-metadata column layout."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"),
        (F.octet_length(payload) * _MS_PER_BYTE).alias("duration_ms"),
    )


_ASSETS_CTE = f"""
assets AS (
    SELECT doc_id AS asset_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
           encode(text) AS payload,
           octet_length(encode(text)) AS n_bytes,
           octet_length(encode(text)) * {_MS_PER_BYTE} AS duration_ms
    FROM documents
)
"""


def q_multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality corpus stats over the binary column: count, total and
    max payload bytes, average duration. Aggregates scalar metadata only —
    payload bytes never leave the scan stage."""
    return (
        assets_table(spark, sf_dir)
        .groupBy("modality")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
            F.sum("duration_ms").alias("total_duration_ms"),
        )
    )


MULTIMODAL_STATS_SQL = f"""
WITH {_ASSETS_CTE.strip()}
SELECT modality,
       COUNT(*) AS n_assets,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       MAX(n_bytes) AS max_bytes,
       CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms
FROM assets
GROUP BY modality
"""


# --- decode seam -------------------------------------------------------------


def pillow_available() -> bool:
    """True when the real pixel codec (pillow) is importable — the same
    gating discipline as operators/merge_delta.delta_available: the real
    twin activates where the library exists, tests skip where it doesn't."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(payload: bytes) -> "object":
    """THE decode seam: PIL-backed where pillow is installed (returns a
    ``PIL.Image.Image``), NotImplementedError otherwise (this container
    ships no image/audio libs — the Spark plumbing is exercised with
    :func:`fake_decode_meta`, the real kernel with the pillow-gated
    pytest twin)."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL/pillow — not available in this "
            "container; plug the real decoder in here"
        ) from exc
    return Image.open(io.BytesIO(payload))


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode → (width, height): pure arithmetic
    on the byte length so the DuckDB oracle can mirror it exactly."""
    n = len(payload)
    return (n * _W_MULT) % _DIM_MOD + 1, (n * _H_MULT) % _DIM_MOD + 1


def decode_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload Arrow batches in → typed metadata
    rows out. This is the exact batch shape a real decoder would use
    (payload bytes available as Python ``bytes`` per row, vectorized
    columns for the metadata outputs)."""
    for pdf in batches:
        dims = [fake_decode_meta(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "width": pd.Series([w for w, _ in dims], dtype="int32"),
                "height": pd.Series([h for _, h in dims], dtype="int32"),
                "n_bytes": pdf["n_bytes"].astype("int64"),
            }
        )


DECODE_META_SCHEMA = "asset_id long, width int, height int, n_bytes long"


def q_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over the image modality via mapInPandas:
    modality filter first (pruned at the scan — only image payloads are
    read into Arrow), then the decode kernel."""
    images = assets_table(spark, sf_dir).filter(F.col("modality") == "image")
    return images.select("asset_id", "payload", "n_bytes").mapInPandas(
        decode_meta_batches, DECODE_META_SCHEMA
    )


IMAGE_META_SQL = f"""
WITH {_ASSETS_CTE.strip()}
SELECT asset_id,
       CAST((n_bytes * {_W_MULT}) % {_DIM_MOD} + 1 AS INT) AS width,
       CAST((n_bytes * {_H_MULT}) % {_DIM_MOD} + 1 AS INT) AS height,
       n_bytes
FROM assets
WHERE modality = 'image'
"""


# --- feature extraction seam -------------------------------------------------

FEATURE_DIM = 8


def extract_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: payload bytes → fixed-dim float feature vector.
    The deterministic stand-in computes byte-level statistics (a real
    pipeline plugs a vision/audio encoder into this exact batch shape:
    payload bytes in, ``array<float>`` out, Arrow both ways). NumPy-
    vectorized per payload; output dim is fixed so downstream simsearch
    operators (`llmdata/simsearch.py`) consume it unchanged."""
    import numpy as np

    for pdf in batches:
        feats = []
        for p in pdf["payload"]:
            a = np.frombuffer(bytes(p), dtype=np.uint8)
            if a.size == 0:
                feats.append([0.0] * FEATURE_DIM)
                continue
            feats.append(
                [
                    float(a.size),
                    float(a.mean()),
                    float(a.std()),
                    float(a.min()),
                    float(a.max()),
                    float(a[0]),
                    float(a[-1]),
                    float(np.unique(a).size),
                ]
            )
        yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": feats})


FEATURES_SCHEMA = "asset_id long, features array<float>"


def q_asset_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over every modality (the encoder-inference
    shape): payload-pruned scan → Arrow batches → fixed-dim vectors.
    Registered rows-only (byte statistics of BLOBs aren't expressible in
    the oracle's SQL); pytest pins exact values on crafted payloads and
    determinism across runs."""
    assets = assets_table(spark, sf_dir)
    return assets.select("asset_id", "payload").mapInPandas(
        extract_features_batches, FEATURES_SCHEMA
    )


_FEATURE_NAMES = (
    "f_size", "f_mean", "f_std", "f_min", "f_max", "f_first", "f_last", "f_unique"
)


def q_asset_features_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`q_asset_features` with the vector unpacked into one scalar
    column per dimension — the registered/served form: result rows must
    stay sortable/hashable through pandas canonicalization at the API
    boundary (ARRAY cells are not)."""
    feats = q_asset_features(spark, sf_dir)
    return feats.select(
        "asset_id",
        *[
            F.element_at("features", i + 1).alias(name)
            for i, name in enumerate(_FEATURE_NAMES)
        ],
    )


# --- resize seam -------------------------------------------------------------

RESIZE_BOX = 256


def resize_image(payload: bytes, target_w: int, target_h: int) -> bytes:
    """THE pixel-resize seam: PIL-backed where pillow is installed
    (decode → ``Image.resize`` → re-encode in the source format), same
    gating contract as :func:`decode_image` otherwise. Pure
    bytes → bytes, so it drops straight into a mapInPandas kernel over
    (payload, target_w, target_h) — :func:`q_image_resize_plan` computes
    those targets."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "pixel resize requires PIL/pillow — not available in this "
            "container; plug the real resizer in here"
        ) from exc
    img = Image.open(io.BytesIO(payload))
    fmt = img.format or "PNG"
    buf = io.BytesIO()
    img.resize((int(target_w), int(target_h))).save(buf, format=fmt)
    return buf.getvalue()


def real_decode_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """The pillow-backed twin of :func:`decode_meta_batches` — identical
    mapInPandas batch shape and DECODE_META_SCHEMA output contract, with
    (width, height) read from the ACTUAL pixels instead of the
    deterministic stand-in arithmetic."""
    for pdf in batches:
        dims = [decode_image(bytes(p)).size for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "width": pd.Series([w for w, _ in dims], dtype="int32"),
                "height": pd.Series([h for _, h in dims], dtype="int32"),
                "n_bytes": pdf["n_bytes"].astype("int64"),
            }
        )


def image_meta_real(images: DataFrame) -> DataFrame:
    """:func:`q_image_meta`'s exact plan (modality-pruned scan →
    mapInPandas → DECODE_META_SCHEMA) with the real decoder — use over a
    table whose payloads are actual encoded images. Pillow-gated:
    activates wherever :func:`pillow_available`."""
    return images.select("asset_id", "payload", "n_bytes").mapInPandas(
        real_decode_meta_batches, DECODE_META_SCHEMA
    )


def q_image_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving fit of every image into a RESIZE_BOX² box — the
    metadata half of a resize pipeline (the pixel half is
    :func:`resize_image` over (payload, target_w, target_h)). Integer
    arithmetic only, so the DuckDB oracle matches exactly: no upscaling;
    the long side lands on RESIZE_BOX."""
    images = assets_table(spark, sf_dir).filter(F.col("modality") == "image")
    w = (F.col("n_bytes") * _W_MULT) % _DIM_MOD + 1
    h = (F.col("n_bytes") * _H_MULT) % _DIM_MOD + 1
    dims = images.select("asset_id", w.alias("width"), h.alias("height"))
    m = F.greatest("width", "height")
    no_resize = m <= RESIZE_BOX
    return dims.select(
        "asset_id",
        "width",
        "height",
        F.when(no_resize, F.col("width"))
        .otherwise(F.expr(f"(width * {RESIZE_BOX}) DIV greatest(width, height)"))
        .cast("int")
        .alias("target_w"),
        F.when(no_resize, F.col("height"))
        .otherwise(F.expr(f"(height * {RESIZE_BOX}) DIV greatest(width, height)"))
        .cast("int")
        .alias("target_h"),
        no_resize.alias("is_noop"),
    )


IMAGE_RESIZE_PLAN_SQL = f"""
WITH {_ASSETS_CTE.strip()},
dims AS (
    SELECT asset_id,
           (n_bytes * {_W_MULT}) % {_DIM_MOD} + 1 AS width,
           (n_bytes * {_H_MULT}) % {_DIM_MOD} + 1 AS height
    FROM assets WHERE modality = 'image'
)
SELECT asset_id,
       width,
       height,
       CAST(CASE WHEN GREATEST(width, height) <= {RESIZE_BOX} THEN width
                 ELSE (width * {RESIZE_BOX}) // GREATEST(width, height) END AS INT)
           AS target_w,
       CAST(CASE WHEN GREATEST(width, height) <= {RESIZE_BOX} THEN height
                 ELSE (height * {RESIZE_BOX}) // GREATEST(width, height) END AS INT)
           AS target_h,
       GREATEST(width, height) <= {RESIZE_BOX} AS is_noop
FROM dims
"""


def q_frame_sample(
    spark: SparkSession, sf_dir: str, every_n_frames: int = 48, limit_assets: int = 50
) -> DataFrame:
    """Frame sampling for the video modality: total frames from
    duration × fps metadata, one output row per sampled frame index —
    the explode shape a frame-extraction pipeline fans out on (the
    per-frame decode would be another mapInPandas over (payload,
    frame_idx)). Deterministic asset subset keeps the output bounded."""
    videos = (
        assets_table(spark, sf_dir)
        .filter(F.col("modality") == "video")
        .filter(F.col("asset_id") < limit_assets * 3)  # deterministic subset
    )
    # integer division on both engines — DuckDB ROUNDS double→int casts
    # while Spark truncates, so float division would drift by one frame
    n_frames = F.expr(f"CAST((duration_ms * {_FPS}) DIV 1000 AS INT)")
    return (
        videos.select("asset_id", n_frames.alias("n_frames"))
        .filter(F.col("n_frames") > 0)  # empty payload → no frames, no rows
        .select(
            "asset_id",
            "n_frames",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_n_frames)
                )
            ).alias("frame_idx"),
        )
    )


def frame_sample_sql(every_n_frames: int = 48, limit_assets: int = 50) -> str:
    return f"""
WITH {_ASSETS_CTE.strip()},
videos AS (
    SELECT asset_id,
           CAST((duration_ms * {_FPS}) // 1000 AS INT) AS n_frames
    FROM assets
    WHERE modality = 'video' AND asset_id < {limit_assets * 3}
)
SELECT asset_id, n_frames, unnest(range(0, n_frames, {every_n_frames})) AS frame_idx
FROM videos
WHERE n_frames > 0
"""
