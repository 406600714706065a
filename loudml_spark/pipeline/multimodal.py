"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched mapInPandas.

The Spark-side plumbing here is real and tested — schemas, batch
iteration, partition-preserving map, output shapes.  The actual media
decode (PIL/librosa/ffmpeg) is NOT available in this container, so
``decode`` raises a clear NotImplementedError unless the caller opts
into the deterministic fake decoder (used by tests and the catalog).

Design notes for 100 TB:
* media bytes never leave the executor: mapInPandas streams Arrow
  batches, metadata-only queries prune the binary column at the scan
  (columnar parquet — check ReadSchema);
* per-row decode cost dominates → size partitions by row count
  (``spark.sql.files.maxPartitionBytes`` down, or repartition) so a
  single giant partition doesn't serialize the job;
* derived features (embeddings, stats) write to a separate table
  keyed by media_id — re-decoding for every downstream query is the
  anti-pattern.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),  # image/audio/video
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]), True),
])

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, sha256 string, "
    "byte_mean double, decoded boolean"
)


def fake_media_table(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media derived from a text table — bytes are
    the utf-8 text, metadata synthesized from its length.  Exercises
    every schema/plumbing path without real codecs."""
    n = F.length(F.col(text_col))
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            (n % 640).cast("int").alias("width"),
            (n % 480).cast("int").alias("height"),
            (n * 10).cast("int").alias("duration_ms"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


def extract_features(
    media_df: DataFrame, *, use_fake_decoder: bool = False,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas.

    With ``use_fake_decoder`` the "decode" is a deterministic byte-level
    pass (length, sha256, mean byte value) — the real decode path
    raises NotImplementedError naming the missing libraries, so the
    failure mode at deploy time is explicit, not a silent wrong answer.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "real media decode needs PIL/librosa/ffmpeg which are "
                    "not installed; pass use_fake_decoder=True for the "
                    "deterministic byte-level fake"
                )
            content = pdf["content"]
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                "sha256": content.map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
                "byte_mean": content.map(
                    lambda b: (sum(b) / len(b)) if b else 0.0
                ),
                "decoded": True,
            })
            yield out

    return media_df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(
    media_df: DataFrame, width: int, height: int, *,
    use_fake_decoder: bool = False, max_fake_bytes: int = 4096,
) -> DataFrame:
    """Resize image media to ``width`` × ``height``: one output row
    per image (media_id, width, height, resized binary).  The real
    path needs PIL and raises a named NotImplementedError; the fake
    decoder emits a deterministic byte transform of bounded size
    (content cycled/truncated to min(width·height, max_fake_bytes))
    so schema, batching and partition behavior are fully exercised.
    Non-image rows are filtered out (pushdown-friendly equality on
    the metadata column — the binary column stays pruned until the
    map)."""
    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")
    schema = "media_id long, width int, height int, resized binary"
    target = min(int(width) * int(height), int(max_fake_bytes))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "image resize needs PIL which is not installed; "
                    "pass use_fake_decoder=True for the deterministic "
                    "byte-level fake"
                )
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"] or b"")
                if content:
                    reps = -(-target // len(content))
                    resized = (content * reps)[:target]
                else:
                    resized = b"\x00" * target
                rows.append({
                    "media_id": r["media_id"],
                    "width": int(width),
                    "height": int(height),
                    "resized": resized,
                })
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "resized"])

    images = media_df.filter(F.col("media_type") == "image")
    return images.mapInPandas(batches, schema=schema)


def frame_sample(
    media_df: DataFrame, every_ms: int = 1000, *, use_fake_decoder: bool = False
) -> DataFrame:
    """Sample frames from video media: one output row per sampled
    frame (media_id, frame_idx, ts_ms, frame binary).  Fake decoder
    emits deterministic byte slices as 'frames'."""
    schema = "media_id long, frame_idx int, ts_ms int, frame binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "video frame sampling needs ffmpeg; pass "
                    "use_fake_decoder=True for the deterministic fake"
                )
            rows = []
            for _, r in pdf.iterrows():
                dur = r["meta"]["duration_ms"] if r["meta"] is not None else 0
                content = r["content"] or b""
                n_frames = max(0, int(dur // every_ms))
                for i in range(min(n_frames, 16)):
                    lo = (i * 7) % max(1, len(content))
                    rows.append({
                        "media_id": r["media_id"],
                        "frame_idx": i,
                        "ts_ms": i * every_ms,
                        "frame": content[lo:lo + 16],
                    })
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame"]
            )

    videos = media_df.filter(F.col("media_type") == "video")
    return videos.mapInPandas(batches, schema=schema)


def audio_windows(
    media_df: DataFrame, window_ms: int = 500, hop_ms: int = 250, *,
    use_fake_decoder: bool = False, max_windows: int = 64,
) -> DataFrame:
    """Slice audio media into overlapping analysis windows (the STFT
    framing shape: ``window_ms`` length, ``hop_ms`` stride): one row
    per window with (media_id, window_idx, start_ms, pcm binary,
    rms double).  Downstream feature extractors consume windows, not
    whole tracks, so a 3-hour recording parallelizes across tasks
    after ONE explode instead of serializing in a single decode call.

    Real decode needs librosa/soundfile (not in this container) and
    raises a named NotImplementedError; the fake decoder emits
    deterministic byte slices as 'PCM' with a byte-mean RMS, fully
    exercising schema, overlap math and batch iteration.
    ``max_windows`` bounds fan-out per row (fake and real alike) —
    the cap every explode needs at 100 TB.
    """
    if window_ms <= 0 or hop_ms <= 0:
        raise ValueError("window_ms and hop_ms must be positive")
    schema = ("media_id long, window_idx int, start_ms int, "
              "pcm binary, rms double")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "audio decode needs librosa/soundfile which are "
                    "not installed; pass use_fake_decoder=True for "
                    "the deterministic byte-level fake"
                )
            rows = []
            for _, r in pdf.iterrows():
                dur = r["meta"]["duration_ms"] if r["meta"] is not None else 0
                content = bytes(r["content"] or b"")
                if dur is None or dur < window_ms or not content:
                    continue
                n_win = 1 + (int(dur) - window_ms) // hop_ms
                for i in range(min(n_win, max_windows)):
                    start = i * hop_ms
                    # fake PCM: the byte span covering the window's
                    # share of the track, cycled if short
                    lo = int(len(content) * start / max(1, dur))
                    hi = int(len(content) * (start + window_ms)
                             / max(1, dur))
                    pcm = content[lo:max(hi, lo + 1)]
                    rows.append({
                        "media_id": r["media_id"],
                        "window_idx": i,
                        "start_ms": start,
                        "pcm": pcm,
                        "rms": float(sum(pcm)) / len(pcm),
                    })
            yield pd.DataFrame(
                rows, columns=["media_id", "window_idx", "start_ms",
                               "pcm", "rms"])

    audio = media_df.filter(F.col("media_type") == "audio")
    return audio.mapInPandas(batches, schema=schema)


def _dhash_cells(content: bytes, grid: int) -> list:
    """Fake-decoder cell matrix: the bytes laid row-major into a
    (grid+1) × grid grid of near-equal chunks, cell value = chunk
    mean.  This preserves the property the real decode pipeline
    (grayscale → area-resample) provides and dHash depends on: a
    small byte perturbation (re-encode noise) moves a few chunk
    means slightly, an insertion shifts chunk boundaries by a
    fraction of a chunk — both small Hamming moves — while unrelated
    bytes randomize every cell."""
    n_cells = (grid + 1) * grid
    if not content:
        return [0.0] * n_cells
    if len(content) < n_cells:
        reps = -(-n_cells // len(content))
        content = (content * reps)[:n_cells]
    n = len(content)
    cells = []
    for i in range(n_cells):
        lo, hi = i * n // n_cells, (i + 1) * n // n_cells
        chunk = content[lo:hi]
        cells.append(sum(chunk) / len(chunk))
    return cells


def dhash_bytes(content: bytes, grid: int = 8) -> int:
    """The shared fake-decode dHash core (used by the Spark UDF AND
    the plain-Python oracle replay): difference hash over the cell
    matrix — bit (r, c) = cell[r][c+1] > cell[r][c], giving a
    ``grid²``-bit fingerprint.  Exact float comparisons on
    deterministic chunk means → engine-portable."""
    cells = _dhash_cells(content, grid)
    h = 0
    for r in range(grid):
        for c in range(grid):
            left = cells[r * (grid + 1) + c]
            right = cells[r * (grid + 1) + c + 1]
            if right > left:
                h |= 1 << (r * grid + c)
    # two's-complement into SIGNED int64 (bit 63 set at grid=8 must
    # not overflow Spark's long); block extraction masks after the
    # arithmetic shift, so sign extension never leaks into a block
    return h - (1 << 64) if h >= (1 << 63) else h


def dhash_images(
    media_df: DataFrame, *, use_fake_decoder: bool = False,
    grid: int = 8,
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image — the
    fingerprint half of image near-dup detection: decode →
    grayscale → (grid+1)×grid area means → horizontal-gradient sign
    bits → one int64.  Shifted/re-encoded copies land within a few
    bits; unrelated images differ in ~grid²/2.  Pair generation is
    NOT here: feed the output to pipeline.dedup.
    hamming_pairs_blocked (the pigeonhole equi-join shared with
    SimHash — no all-pairs stage at any scale).

    The real path needs PIL and raises a named NotImplementedError
    (the module's gated-codec contract); ``use_fake_decoder``
    substitutes the byte-chunk-mean grid (see :func:`_dhash_cells`)
    whose perturbation behavior matches the real pipeline's, so the
    banding/verification plumbing is fully exercised and
    oracle-paired.  Non-image rows are filtered before the map (the
    binary column stays pruned until then).

    Output: (media_id, dhash long)."""
    if grid < 2 or grid > 8:
        raise ValueError(
            f"grid={grid} unsupported: need 2 <= grid <= 8 "
            "(grid² sign bits must fit an int64)")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "image dHash needs PIL which is not installed; "
                    "pass use_fake_decoder=True for the deterministic "
                    "byte-chunk-mean fake"
                )
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "dhash": pdf["content"].map(
                    lambda b: dhash_bytes(bytes(b or b""), grid)),
            })

    images = media_df.filter(F.col("media_type") == "image")
    return images.mapInPandas(batches, schema="media_id long, dhash long")
