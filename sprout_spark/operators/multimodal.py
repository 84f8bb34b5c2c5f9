"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The container has no image/audio codecs, so the *decode* kernels are
stubbed two ways (clearly marked):

* ``decode="strict"`` raises ``NotImplementedError`` (production would
  plug Pillow/torchaudio/PyAV here);
* ``decode="fake"`` (default, used by tests and the oracle queries)
  treats the payload bytes as pixels/samples — deterministic, so the
  Spark-side contract (schema, Arrow batch shape, partitioning, UDF
  signatures, feature math) is fully real, tested end-to-end, and
  oracle-checkable.

Design rules that survive 100 TB:

* media bytes stay in one ``binary`` column; metadata is typed columns —
  Parquet/Iceberg store the blob column contiguously and Catalyst prunes
  it away for metadata-only queries (never pay blob IO to count rows;
  asserted on a real parquet scan in ``tests/test_pipeline_ops.py``);
* all kernels are ``mapInArrow`` over RecordBatches and consume the
  payload column as numpy views over the Arrow binary buffers (flat data
  + offsets) — blobs are never pickled into per-row Python objects, and
  per-row feature math is one cumulative-sum + gather pass per batch;
* decode output is feature-sized, not media-sized — decode + reduce in
  the same pass so shuffles carry features (KBs) never frames (MBs);
* ``repartition_by_bytes`` splits by cumulative blob size, not row count
  (1000 rows of 4K video ≠ 1000 rows of thumbnails), with a two-phase
  deterministic plan: per-group byte subtotals (tiny) → group offsets →
  in-group running sums under a partitioned window. No single-task
  global window, no driver-side collect of data rows.
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


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the ``documents`` driver
    table (payload = utf-8 text bytes, kind cycles with doc_id, geometry
    from the text length) — every downstream feature is therefore
    SQL-oracle-able against ``documents`` itself. width*height is sized
    under the byte length so the fake decode never pads."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit("raw").alias("fmt"),
        F.lit(8).alias("width"),
        F.floor(F.length("text") / 16).cast("int").alias("height"),
        F.lit(0).alias("sample_rate"),
        F.lit(2).alias("n_frames"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _binary_views(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Arrow binary array → (flat uint8 data, int64 starts, int64 lens)
    without per-row Python: numpy views over the offsets + data buffers
    (shared helper in hashing.py). Null payloads behave as empty."""
    from ..hashing import arrow_buffer_views

    data, offsets, lens = arrow_buffer_views(arr)
    return data, offsets[:-1], lens


def extract_image_features(
    df: DataFrame, decode: str = "fake", resize_to: int = 8
) -> DataFrame:
    """Decode → resize → feature-extract in ONE pass, feature-sized output
    (media_id, mean double, std double, thumb array<float>).

    STUB NOTE: ``fake`` decode reads payload bytes as w×h grayscale pixels
    (zero-padded if short); a real deployment swaps in a codec at the
    marked line. All surrounding math is vectorized over the whole batch:
    means/stds from two cumulative sums, thumbnails from one fancy gather
    — zero per-row Python, blobs stay Arrow buffers."""
    if decode == "strict":
        raise NotImplementedError(
            "no image codec in this environment; plug a real decoder here"
        )

    def fn(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            ws = batch.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            hs = batch.column(2).to_numpy(zero_copy_only=False).astype(np.int64)
            # <-- a real codec would decode batch.column(3) here; the fake
            # path reads the bytes directly as pixels
            data, starts, lens = _binary_views(batch.column(3))
            need = np.maximum(ws * hs, 1)
            used = np.minimum(lens, need)  # bytes beyond `used` pad as 0
            cs = np.concatenate([[0], np.cumsum(data, dtype=np.int64)])
            cs2 = np.concatenate(
                [[0], np.cumsum(data.astype(np.int64) ** 2, dtype=np.int64)]
            )
            s = cs[starts + used] - cs[starts]
            s2 = cs2[starts + used] - cs2[starts]
            mean = s / need
            std = np.sqrt(np.maximum(s2 / need - mean**2, 0.0))
            # nearest-neighbor thumbnail: one (n, R, R) gather. Degenerate
            # geometry (width or height 0) must clamp to 0 — a negative
            # yi/xi would otherwise pass the `< lens` check and gather
            # bytes from the PREVIOUS row's payload
            r = resize_to
            frac = np.arange(r, dtype=np.float64) / max(r - 1, 1)
            yi = (frac[None, :] * np.maximum(hs - 1, 0)[:, None]).astype(np.int64)
            xi = (frac[None, :] * np.maximum(ws - 1, 0)[:, None]).astype(np.int64)
            pix = yi[:, :, None] * ws[:, None, None] + xi[:, None, :]
            valid = (pix >= 0) & (pix < lens[:, None, None])
            if len(data):
                src = np.clip(
                    starts[:, None, None] + pix, 0, max(len(data) - 1, 0)
                )
                thumb = np.where(valid, data[src], 0).astype(np.float32)
            else:
                # all payloads empty/null: data is length 0, so even the
                # clamped gather index 0 is out of bounds — thumbs are 0
                thumb = np.zeros((n, r, r), dtype=np.float32)
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "mean": pa.array(mean, pa.float64()),
                    "std": pa.array(std, pa.float64()),
                    "thumb": pa.array(
                        list(thumb.reshape(n, r * r)), pa.list_(pa.float32())
                    ),
                }
            )

    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "width", "height", "payload")
        .mapInArrow(
            fn, "media_id bigint, mean double, std double, thumb array<float>"
        )
    )


def _audio_features_kernel(batch: "pa.RecordBatch") -> "pa.RecordBatch":
    """(media_id, payload) batch → (media_id, n_samples, rms,
    mean_crossings). Module-level so the sliced-array/offset regression
    tests can drive it directly (see ``extract_audio_features``)."""
    n = batch.num_rows
    ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    # <-- a real codec would decode batch.column(1) here; the fake
    # path reads the bytes directly as samples
    data, starts, lens = _binary_views(batch.column(1))
    d64 = data.astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(d64)])
    cs2 = np.concatenate([[0], np.cumsum(d64 * d64)])
    tot = cs[starts + lens] - cs[starts]
    tot2 = cs2[starts + lens] - cs2[starts]
    denom = np.maximum(lens, 1)
    rms = np.sqrt(tot2 / denom)
    # mean crossings: sign bit s_i = (sample_i * n_row > total_row),
    # count adjacent flips within each row (integer math only).
    # Gather each row's bytes by ABSOLUTE buffer index (starts may not
    # tile the buffer: sliced arrays, offsets, null slots) — same
    # contract as the image kernel's starts+pix gather.
    rid = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(rid):
        seg_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
        intra = np.arange(len(rid), dtype=np.int64) - np.repeat(seg_start, lens)
        seg = d64[np.repeat(starts, lens) + intra]
        s = seg * lens[rid] > tot[rid]
        same_row = rid[1:] == rid[:-1]
        flips = same_row & (s[1:] != s[:-1])
        crossings = np.bincount(rid[1:][flips], minlength=n)
    else:
        crossings = np.zeros(n, dtype=np.int64)
    return pa.RecordBatch.from_pydict(
        {
            "media_id": pa.array(ids, pa.int64()),
            "n_samples": pa.array(lens, pa.int64()),
            "rms": pa.array(rms, pa.float64()),
            "mean_crossings": pa.array(crossings.astype(np.int64), pa.int64()),
        }
    )


def extract_audio_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Audio feature extraction in ONE pass, feature-sized output
    (media_id, n_samples bigint, rms double, mean_crossings bigint).

    STUB NOTE: ``fake`` decode reads payload bytes as unsigned 8-bit
    samples (a real deployment plugs torchaudio/soundfile at the marked
    line — the Spark-side plumbing is identical). Features:

    * ``rms`` — sqrt(mean(sample²)), from one cumulative sum of squares;
    * ``mean_crossings`` — how many consecutive-sample pairs cross the
      payload's own mean (the zero-crossing-rate analog for unsigned
      samples; ASCII payloads never cross 128, so crossing the mean is
      the deterministic, non-vacuous variant). The comparison is scaled
      to integers (``sample*n > total``) so Spark and the SQL oracle
      agree bit-for-bit with no float thresholds.

    All math is vectorized over the whole batch (cumsums + one flat
    row-segmented pass); blobs stay Arrow buffers, zero per-row Python.
    """
    if decode == "strict":
        raise NotImplementedError(
            "no audio codec in this environment; plug a real decoder here"
        )

    def fn(batches):
        for batch in batches:
            if batch.num_rows:
                yield _audio_features_kernel(batch)

    return (
        df.where(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInArrow(
            fn,
            "media_id bigint, n_samples bigint, rms double, "
            "mean_crossings bigint",
        )
    )


def sample_video_frames(df: DataFrame, every: int = 2, decode: str = "fake") -> DataFrame:
    """Frame sampling: one output row per kept frame, feature-sized
    (media_id, frame_idx, mean double). Vectorized: the flat kept-frame
    list is built with repeat/arange over the batch, frame means come
    from one cumulative sum — zero per-row Python."""
    if decode == "strict":
        raise NotImplementedError("no video codec in this environment")

    def fn(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            ws = batch.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            hs = batch.column(2).to_numpy(zero_copy_only=False).astype(np.int64)
            nf = batch.column(3).to_numpy(zero_copy_only=False).astype(np.int64)
            data, starts, lens = _binary_views(batch.column(4))
            fsize = np.maximum(ws * hs, 1)
            kept = (np.maximum(nf, 0) + every - 1) // every  # frames per row
            total = int(kept.sum())
            if total == 0:
                continue
            row = np.repeat(np.arange(n, dtype=np.int64), kept)
            excl = np.concatenate([[0], np.cumsum(kept)[:-1]])
            fidx = (np.arange(total, dtype=np.int64) - excl[row]) * every
            fs = starts[row] + fidx * fsize[row]
            fe = np.minimum(fs + fsize[row], starts[row] + lens[row])
            present = fe > fs  # drop frames entirely past the payload
            cs = np.concatenate([[0], np.cumsum(data, dtype=np.int64)])
            fs, fe, row, fidx = fs[present], fe[present], row[present], fidx[present]
            means = (cs[fe] - cs[fs]) / (fe - fs)
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(ids[row], pa.int64()),
                    "frame_idx": pa.array(fidx.astype(np.int32), pa.int32()),
                    "mean": pa.array(means, pa.float64()),
                }
            )

    return (
        df.where(F.col("kind") == "video")
        .select("media_id", "width", "height", "n_frames", "payload")
        .mapInArrow(fn, "media_id bigint, frame_idx int, mean double")
    )


def repartition_by_bytes(
    df: DataFrame,
    target_bytes: int = 128 << 20,
    order_col: str = "media_id",
    n_groups: int = 64,
) -> DataFrame:
    """Partition media rows so each partition holds ~``target_bytes`` of
    payload (row-count partitioning is wrong for mixed media sizes).

    Two-phase, fully deterministic, no single-task pass over the data:

    1. rows hash into ``n_groups`` groups on ``order_col``; one tiny
       aggregate computes per-group byte subtotals (``n_groups`` rows),
       whose prefix sums become group offsets — the only driver-side data
       is that subtotal list;
    2. a window partitioned BY GROUP (parallel, never global) computes
       in-group running sums ordered by ``order_col``; global position =
       group offset + in-group running sum; rows then bucket at
       ``target/16`` granularity and hash into ``total/target``
       partitions — each partition receives ~16 fine buckets, so the
       balls-in-bins load concentrates near the target (max partition
       stays within ~2x target; a 1:1 bucket map under hash placement
       would stack whole target-sized buckets instead).

    Every row's bucket depends only on (group hash, order_col, payload
    hash, sizes), so reruns are byte-stable regardless of physical
    partitioning. Duplicate ``order_col`` values are tie-broken by a
    payload hash inside the window ordering — without it the in-group
    running sum (hence the bucket assignment) would be free to permute
    across runs; rows identical in BOTH order_col and payload are
    genuinely interchangeable, so any order gives the same bucket
    BYTES."""
    from pyspark.sql.window import Window

    sized = df.withColumn(
        "_bytes", F.coalesce(F.length("payload").cast("bigint"), F.lit(0))
    ).withColumn("_grp", F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_groups)))
    totals = {
        r["_grp"]: r["t"]
        for r in sized.groupBy("_grp").agg(F.sum("_bytes").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for g in sorted(totals):
        offsets[g] = acc
        acc += totals[g]
    n_parts = max(1, int((acc + target_bytes - 1) // target_bytes))
    fine = max(1, target_bytes // 16)
    off_map = F.create_map(
        *[F.lit(v) for g in sorted(offsets) for v in (g, offsets[g])]
    )
    w = (
        Window.partitionBy("_grp")
        .orderBy(F.col(order_col), F.xxhash64(F.col(order_col), F.col("payload")))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bucketed = sized.withColumn(
        "_bucket",
        F.floor(
            (F.sum("_bytes").over(w) + off_map[F.col("_grp")] - 1)
            / F.lit(fine)
        ),
    )
    return bucketed.repartition(n_parts, "_bucket").drop(
        "_bytes", "_grp", "_bucket"
    )
