"""Multimodal (image/audio/video) column plumbing (north-star
extension; SURVEY.md Phase 5).

Media are opaque ``binary`` columns plus a typed metadata struct --
the lakehouse pattern for multimodal training data.  The Spark-side
plumbing (schemas, Arrow batch shape, ``mapInPandas`` signatures,
partitioning) is real and tested; the actual codec work is stubbed
because no image/audio library ships in this container:

- :func:`decode_media` runs a *deterministic fake decode* (md5
  checksum + size-derived dimensions) through the same Arrow batch
  path a real decoder would use, so the pipeline is end-to-end
  testable and DuckDB-oracle-checkable;
- :func:`resize_images` is REAL: nearest-neighbor resample over raw
  uint8 pixel buffers in vectorized numpy -- only the
  compressed-payload codec hop (JPEG/PNG decompress) remains outside
  the container's reach.

Scale notes: media bytes never hit the driver; ``mapInPandas``
streams Arrow batches executor-side, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
(media rows are wide -- set it low, e.g. 64, for >MB media).  Decode
output drops the payload column as early as possible so downstream
stages shuffle metadata, not bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata produced by the (fake) decoder -- what a real image decode
#: would yield (dimensions, channel count, byte size, checksum).
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_checksum", T.StringType()),
])


def media_table(df: DataFrame, id_col: str, payload_col,
                media_type: str = "image") -> DataFrame:
    """Normalize any source into the engine's media layout:
    (media_id, content binary, media_type).  ``payload_col`` may be a
    string column (UTF-8 encoded -- the test path, deterministic fake
    bytes) or an existing binary column."""
    content = F.col(payload_col) if isinstance(payload_col, str) \
        else payload_col
    return df.select(F.col(id_col).cast("long").alias("media_id"),
                     content.cast("binary").alias("content"),
                     F.lit(media_type).alias("media_type"))


def decode_media(media: DataFrame) -> DataFrame:
    """Fake-decode each binary payload via ``mapInPandas`` (Arrow
    batches, executor-side, payload never collected).

    The "decode" is deterministic: md5 checksum of the raw bytes,
    dimensions derived from the byte length -- a stand-in with the
    exact plumbing (schema in/out, batch iteration, per-row bytes
    access) of a real ``PIL.Image.open``/ffmpeg call, so swapping the
    real codec in changes only the body of ``decode_batch``."""

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            n_bytes = content.map(len)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": n_bytes.astype("int64"),
                "checksum": content.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "width": (n_bytes % 640 + 1).astype("int32"),
                "height": (n_bytes * 7 % 480 + 1).astype("int32"),
                "channels": pd.Series([3] * len(pdf), dtype="int32"),
            })

    return media.select("media_id", "content") \
        .mapInPandas(decode_batch, schema=MEDIA_META_SCHEMA)


def sample_frames(media: DataFrame, every: int = 10,
                  frames_mod: int = 100) -> DataFrame:
    """Video frame sampling through the same Arrow path: each payload
    "contains" ``len(bytes) % frames_mod`` frames; emit every
    ``every``-th frame with a per-frame checksum (md5 of
    "<payload-md5>:<idx>" -- where a real pipeline would emit decoded
    frame tensors).  One input row fans out to many output rows --
    the mapInPandas analog of a generator/UDTF."""

    def frame_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                base = hashlib.md5(bytes(buf)).hexdigest()
                for i in range(0, len(buf) % frames_mod, every):
                    ids.append(mid)
                    idxs.append(i)
                    sums.append(hashlib.md5(
                        f"{base}:{i}".encode()).hexdigest())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_checksum": pd.Series(sums, dtype="object"),
            })

    return media.select("media_id", "content") \
        .mapInPandas(frame_batch, schema=FRAME_SCHEMA)


#: resize output layout: resized raw pixel buffer + its new dims
RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
])


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor image resize over RAW PIXEL BUFFERS -- pure
    numpy, no codec library.  Input rows carry (media_id, content,
    width, height, channels) where ``content`` is an H*W*C uint8
    buffer (what a real decoder emits; a COMPRESSED payload must go
    through its codec first -- that boundary is the container's
    missing PIL/ffmpeg, see :func:`decode_media`).  Buffers shorter
    than width*height*channels are cyclically padded (``np.resize``)
    so the operator is total and deterministic on arbitrary test
    bytes.

    The resample is integer floor-mapping (``dst_i * src_h // dst_h``)
    -- exact integer arithmetic, so output bytes are bit-identical on
    any platform.  Scale shape: mapInPandas Arrow batches, vectorized
    numpy fancy-indexing per image, bytes never hit the driver;
    output rows carry the new dims so downstream stages need not
    re-infer them."""

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            out = []
            for buf, w, h, c in zip(pdf["content"], pdf["width"],
                                    pdf["height"], pdf["channels"]):
                w, h, c = int(w), int(h), int(c)
                src = np.resize(
                    np.frombuffer(bytes(buf), dtype=np.uint8),
                    h * w * c).reshape(h, w, c)
                ys = np.arange(height) * h // height
                xs = np.arange(width) * w // width
                out.append(src[ys][:, xs].tobytes())
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "content": out,
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
                "channels": pdf["channels"].astype("int32"),
            })

    return media.select("media_id", "content", "width", "height",
                        "channels").mapInPandas(resize_batch,
                                                schema=RESIZED_SCHEMA)


def png_metadata(media: DataFrame) -> DataFrame:
    """REAL (not fake) image-metadata extraction, zero codecs needed:
    parse the PNG signature + IHDR chunk straight out of the binary
    payload with pure Catalyst expressions -- hex the leading bytes
    once, slice big-endian fields out of the hex string, convert base
    16.  The whole decode stays inside whole-stage codegen; no UDF, no
    Arrow hop, no library.  (Header-only metadata extraction is how a
    100-TB pipeline cheaply indexes dimensions before deciding what to
    fully decode.)

    PNG layout: 8-byte signature 89 50 4E 47 0D 0A 1A 0A, then the
    IHDR chunk whose data starts at byte 17: width uint32be (17-20),
    height uint32be (21-24), bit depth (25), color type (26).
    Channels derive from color type (0 gray, 2 RGB, 3 palette,
    4 gray+alpha, 6 RGBA).  Non-PNG payloads yield is_png=false and
    NULL fields."""
    hx = F.hex(F.substring(F.col("content"), 1, 26))
    is_png = F.substring(hx, 1, 16) == "89504E470D0A1A0A"

    def be(hstart: int, nbytes: int):
        return F.conv(F.substring(hx, hstart, 2 * nbytes), 16, 10) \
            .cast("long")

    color_type = be(51, 1)
    channels = (F.when(color_type.isin(0, 3), 1)
                .when(color_type == 2, 3)
                .when(color_type == 4, 2)
                .when(color_type == 6, 4).cast("int"))
    null_unless = lambda c: F.when(is_png, c)
    return media.select(
        "media_id", is_png.alias("is_png"),
        null_unless(be(33, 4)).alias("width"),
        null_unless(be(41, 4)).alias("height"),
        null_unless(be(49, 1).cast("int")).alias("bit_depth"),
        null_unless(color_type.cast("int")).alias("color_type"),
        null_unless(channels).alias("channels"))


def wav_metadata(media: DataFrame) -> DataFrame:
    """REAL audio-metadata extraction, zero codecs: parse the RIFF/WAVE
    header (the canonical 44-byte PCM layout) straight out of the
    binary payload with pure Catalyst expressions -- the
    little-endian sibling of :func:`png_metadata` (WAV fields are LE,
    so each field's hex byte pairs are reversed before base-16
    conversion).  Stays inside whole-stage codegen; no UDF, no Arrow
    hop.

    Layout parsed: "RIFF" (1-4), "WAVE" (9-12), "fmt " (13-16),
    audio_format u16le (21-22), n_channels u16le (23-24), sample_rate
    u32le (25-28), byte_rate u32le (29-32), block_align u16le (33-34),
    bits_per_sample u16le (35-36), "data" size u32le (41-44).
    ``duration_s`` = data_bytes / byte_rate -- one double division of
    two exact integers.  Non-RIFF payloads yield is_wav=false and NULL
    fields."""
    hx = F.hex(F.substring(F.col("content"), 1, 44))

    def le(byte_start: int, nbytes: int):
        parts = [F.substring(hx, (byte_start - 1) * 2 + 1 + 2 * i, 2)
                 for i in reversed(range(nbytes))]
        return F.conv(F.concat(*parts), 16, 10).cast("long")

    is_wav = ((F.substring(hx, 1, 8) == "52494646")
              & (F.substring(hx, 17, 8) == "57415645")
              & (F.substring(hx, 25, 8) == "666D7420"))
    byte_rate = le(29, 4)
    data_bytes = le(41, 4)
    null_unless = lambda c: F.when(is_wav, c)
    return media.select(
        "media_id", is_wav.alias("is_wav"),
        null_unless(le(21, 2).cast("int")).alias("audio_format"),
        null_unless(le(23, 2).cast("int")).alias("n_channels"),
        null_unless(le(25, 4)).alias("sample_rate"),
        null_unless(byte_rate).alias("byte_rate"),
        null_unless(le(35, 2).cast("int")).alias("bits_per_sample"),
        null_unless(data_bytes).alias("data_bytes"),
        null_unless(F.when(byte_rate > 0,
                           data_bytes.cast("double")
                           / byte_rate.cast("double")))
        .alias("duration_s"))
