"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through ``mapInPandas`` stages.

The image decode tries PIL at call time on the executor and uses it when
present (real pixels, undecodable payloads -> decode_ok=False); in
codec-free containers like this sandbox it falls back to a clearly
marked deterministic stub so everything Spark-side stays real and
tested: the schema contract, Arrow batch shapes, partition sizing for
large blobs, and the UDF signatures.

Scale notes: blob tables should set
``spark.sql.files.maxPartitionBytes`` low enough that one task's Arrow
batches hold a bounded number of blobs; ``media_repartition`` sizes the
shuffle by cumulative byte budget, not row count.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),       # images/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),    # audio/video
    T.StructField("payload", T.BinaryType(), True),      # the opaque blob
])


def synth_media(spark, n: int, *, kind: str = "image", blob_bytes: int = 4096,
                seed: int = 0) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes; metadata
    consistent with kind) for exercising the plumbing."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.col("id"), 4) * 64 + 64).cast("int").alias("width"),
        (F.pmod(F.col("id") + 1, 4) * 64 + 64).cast("int").alias("height"),
        (F.pmod(F.col("id"), 30) * 1000).alias("duration_ms"),
        F.sha2(F.concat(F.lit(f"media-{seed}-"), F.col("id").cast("string")), 512)
        .cast("binary").alias("payload"),
    )
    # repeat the 128-byte digest text out to blob_bytes
    reps = max(1, blob_bytes // 128)
    return df.withColumn(
        "payload",
        F.expr(f"cast(repeat(cast(payload as string), {reps}) as binary)"),
    )


def media_repartition(df: DataFrame, *, target_bytes: int = 64 << 20,
                      avg_blob_bytes: int | None = None) -> DataFrame:
    """Repartition a blob table by BYTE budget: rows-per-partition =
    target_bytes / avg blob size (sampled if not given). Prevents a task
    from holding gigabytes of Arrow payloads."""
    if avg_blob_bytes is None:
        sample = df.select(F.avg(F.length("payload"))).first()[0] or 1.0
        avg_blob_bytes = int(sample)
    total = df.count()
    rows_per_part = max(1, target_bytes // max(avg_blob_bytes, 1))
    n_parts = max(1, (total + rows_per_part - 1) // rows_per_part)
    return df.repartition(int(n_parts))


# ---------------------------------------------------------------------------
# decode / feature-extract stages (decode stubbed; plumbing real)
# ---------------------------------------------------------------------------

def _fake_decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB DECODER: a real deployment replaces this with
    PIL.Image.open(BytesIO(payload)). Deterministic fake: tile the blob
    bytes into an (h, w, 3) uint8 array so downstream feature math is
    exercised on realistic shapes."""
    if payload is None or width is None or height is None:
        raise NotImplementedError("real image decode requires PIL/libvips")
    need = width * height * 3
    buf = np.frombuffer(payload, dtype=np.uint8)
    reps = need // len(buf) + 1
    return np.tile(buf, reps)[:need].reshape(height, width, 3)


def _decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real decode when PIL exists in the environment (imported at call
    time on the EXECUTOR — the driver container may differ), otherwise
    the deterministic stub. With PIL present, an undecodable payload
    raises (-> decode_ok=False) instead of silently faking; without it,
    the stub keeps the plumbing testable in codec-free sandboxes."""
    try:
        from PIL import Image  # optional dependency, absent in sandbox
    except ImportError:
        return _fake_decode_rgb(payload, width, height)
    import io

    if payload is None:
        raise NotImplementedError("no payload to decode")
    try:
        img = Image.open(io.BytesIO(bytes(payload))).convert("RGB")
    except Exception as e:
        raise ValueError(f"undecodable image payload: {e}") from e
    return np.asarray(img, dtype=np.uint8)


def image_features(df: DataFrame, *, resize_to: int = 32,
                   decoder: str = "auto") -> DataFrame:
    """Decode -> resize (area-mean pooling) -> 12-dim color-stat feature
    vector, one mapInPandas stage. Output keeps media_id only — blobs are
    dropped as early as possible (column pruning for binary data).

    ``decoder``: "auto" (PIL when importable on the executor, else the
    deterministic stub) or "stub" (always the deterministic tiled-byte
    fake — used by the invariant query so its output is reproducible
    regardless of which codecs the executor image happens to ship)."""
    if decoder not in ("auto", "stub"):
        raise ValueError(f"decoder must be 'auto' or 'stub', got {decoder!r}")
    decode = _fake_decode_rgb if decoder == "stub" else _decode_rgb

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, ok = [], [], []
            for rid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                try:
                    img = decode(payload, w, h)
                    # nearest-neighbor resize to (resize_to, resize_to)
                    yi = (np.arange(resize_to) * img.shape[0] // resize_to)
                    xi = (np.arange(resize_to) * img.shape[1] // resize_to)
                    small = img[np.ix_(yi, xi)].astype(np.float64)
                    f = np.concatenate([
                        small.mean(axis=(0, 1)), small.std(axis=(0, 1)),
                        small.min(axis=(0, 1)), small.max(axis=(0, 1)),
                    ])
                    feats.append(f.tolist())
                    ok.append(True)
                except (NotImplementedError, ValueError):
                    feats.append(None)
                    ok.append(False)
                ids.append(rid)
            yield pd.DataFrame({
                "media_id": ids, "features": feats, "decode_ok": ok,
            })

    return df.select("media_id", "payload", "width", "height").mapInPandas(
        extract, schema="media_id bigint, features array<double>, decode_ok boolean"
    )


def frame_sample_plan(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows — the
    explode is pure Catalyst (sequence over duration); the actual frame
    grab would run in a downstream mapInPandas beside the decoder stub."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                       F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def audio_window_plan(df: DataFrame, *, window_ms: int = 500) -> DataFrame:
    """Audio windowing plan: (media_id, win_start_ms, win_end_ms)."""
    return df.filter(F.col("kind") == "audio").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                       F.lit(window_ms))
        ).alias("win_start_ms"),
    ).withColumn("win_end_ms", F.col("win_start_ms") + window_ms)
