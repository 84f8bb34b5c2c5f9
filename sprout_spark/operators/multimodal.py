"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The container has no image/audio codecs, so the *decode* kernels are
stubbed two ways (clearly marked):

* ``decode="strict"`` raises ``NotImplementedError`` (production would
  plug Pillow/torchaudio/PyAV here);
* ``decode="fake"`` (default, used by tests) produces a deterministic
  fake decode — bytes reinterpreted as pixels/samples — so the Spark-side
  contract (schema, Arrow batch shape, partitioning, UDF signatures) is
  fully real and tested end-to-end.

Design rules that survive 100 TB:

* media bytes stay in one ``binary`` column; metadata is typed columns —
  Parquet/Iceberg store the blob column contiguously and Catalyst prunes
  it away for metadata-only queries (never pay blob IO to count rows);
* all kernels are ``mapInArrow`` over RecordBatches: one Python crossing
  per batch, blobs move as Arrow buffers, not pickled rows;
* decode output is feature-sized, not media-sized — decode + reduce in
  the same pass so shuffles carry features (KBs) never frames (MBs);
* ``repartition_by_bytes`` splits by cumulative blob size, not row count
  (1000 rows of 4K video ≠ 1000 rows of thumbnails).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, fmt string, width int, height int, "
    "sample_rate int, n_frames int, payload binary"
)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table with the canonical schema (tests)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = int(8 + (i * 7) % 24), int(8 + (i * 5) % 16)
        sr = 16000 if kind == "audio" else 0
        nf = int(1 + (i % 5)) if kind == "video" else 1
        size = w * h * nf if kind != "audio" else sr // 100
        payload = rng.randint(0, 256, size=size, dtype=np.uint8).tobytes()
        rows.append((i, kind, "raw", w, h, sr, nf, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_image(payload: bytes, w: int, h: int) -> np.ndarray:
    """STUB: deterministic fake decode — bytes as grayscale pixels.
    A real deployment replaces this with an actual codec."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = w * h
    if len(buf) < need:
        buf = np.pad(buf, (0, need - len(buf)))
    return buf[:need].reshape(h, w).astype(np.float32)


def extract_image_features(
    df: DataFrame, decode: str = "fake", resize_to: int = 8
) -> DataFrame:
    """Decode → resize → feature-extract in ONE pass. Output is
    feature-sized: (media_id, mean double, std double, thumb array<float>).
    """
    if decode == "strict":
        raise NotImplementedError(
            "no image codec in this environment; plug a real decoder here"
        )

    def fn(batches):
        for batch in batches:
            d = batch.to_pydict()
            ids, means, stds, thumbs = [], [], [], []
            for mid, w, h, payload in zip(
                d["media_id"], d["width"], d["height"], d["payload"]
            ):
                img = _fake_decode_image(payload or b"", w, h)
                # nearest-neighbor "resize" to resize_to x resize_to
                yi = np.linspace(0, img.shape[0] - 1, resize_to).astype(int)
                xi = np.linspace(0, img.shape[1] - 1, resize_to).astype(int)
                thumb = img[np.ix_(yi, xi)]
                ids.append(mid)
                means.append(float(img.mean()))
                stds.append(float(img.std()))
                thumbs.append(thumb.ravel().tolist())
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "mean": pa.array(means, pa.float64()),
                    "std": pa.array(stds, pa.float64()),
                    "thumb": pa.array(thumbs, pa.list_(pa.float32())),
                }
            )

    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "width", "height", "payload")
        .mapInArrow(
            fn, "media_id bigint, mean double, std double, thumb array<float>"
        )
    )


def sample_video_frames(df: DataFrame, every: int = 2, decode: str = "fake") -> DataFrame:
    """Frame sampling: one output row per kept frame, feature-sized.
    Output: (media_id, frame_idx, mean double)."""
    if decode == "strict":
        raise NotImplementedError("no video codec in this environment")

    def fn(batches):
        for batch in batches:
            d = batch.to_pydict()
            ids, fidx, means = [], [], []
            for mid, w, h, nf, payload in zip(
                d["media_id"], d["width"], d["height"], d["n_frames"], d["payload"]
            ):
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                fsize = w * h
                for f in range(0, nf, every):
                    frame = buf[f * fsize : (f + 1) * fsize]
                    if len(frame) == 0:
                        continue
                    ids.append(mid)
                    fidx.append(f)
                    means.append(float(frame.mean()))
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "frame_idx": pa.array(fidx, pa.int32()),
                    "mean": pa.array(means, pa.float64()),
                }
            )

    return (
        df.where(F.col("kind") == "video")
        .select("media_id", "width", "height", "n_frames", "payload")
        .mapInArrow(fn, "media_id bigint, frame_idx int, mean double")
    )


def repartition_by_bytes(df: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Partition media rows so each partition holds ~target_bytes of
    payload (row-count partitioning is wrong for mixed media sizes):
    bucket id = floor(running_sum(bytes) / target), assigned over a
    deterministic media_id order, then repartition on the bucket.

    Note: the running sum uses an unpartitioned window (one task for the
    cumulative pass over (media_id, bytes) — 16 bytes/row); at extreme
    row counts replace it with a per-partition-sum + offset broadcast."""
    from pyspark.sql.window import Window

    sized = df.withColumn("_bytes", F.length("payload").cast("bigint"))
    w = Window.orderBy("media_id").rowsBetween(Window.unboundedPreceding, 0)
    bucketed = sized.withColumn(
        "_bucket", F.floor((F.sum("_bytes").over(w) - 1) / F.lit(target_bytes))
    )
    n_parts = (
        bucketed.agg(F.max("_bucket")).collect()[0][0] or 0
    ) + 1
    return (
        bucketed.repartition(int(n_parts), "_bucket").drop("_bytes", "_bucket")
    )
