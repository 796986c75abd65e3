"""Multimodal (image/audio/video) column plumbing over opaque binary payloads.

Media assets are carried as ``binary`` columns with typed metadata structs —
the lake-native pattern (same as Iceberg/Parquet BLOB columns). All
per-asset work runs through Arrow-batched ``mapInPandas``: the Spark-side
contract (schema in/out, batch shape, partitioning) is real and tested.
``decode_image``/``resize_image`` REALLY decode binary PPM/PGM (pure numpy
— no codec libraries needed); formats that require absent codec libs
(JPEG/PNG/audio/video) raise NotImplementedError from the same entry point
— swap in PIL/ffmpeg on a real cluster and nothing else changes.

Batch-shape rules that matter at 100 TB:

- metadata extraction reads only the first KB of each payload (magic + header
  fields) — never decode-to-pixels for a stats pass;
- ``mapInPandas`` yields per Arrow batch, so peak memory is
  ``batch_rows * avg_payload``, bounded via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` for fat payloads;
- frame/segment sampling emits offsets computed from the header, so the
  decode stage can column-prune the payload entirely when only positions are
  needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("magic_hex", T.StringType()),
        T.StructField("sample_b0", T.LongType()),
        T.StructField("sample_b1", T.LongType()),
        T.StructField("sample_b2", T.LongType()),
        T.StructField("sample_b3", T.LongType()),
    ]
)


def _make_ppm_codec():
    """Factory for the pure-numpy PPM codec (decode/encode), built in a
    function scope so mapInPandas closures that capture these functions
    pickle BY VALUE — workers never import this package (the --py-files
    contract, same pattern as functions/text.py)."""

    def decode(payload: bytes):
        """Decode a binary PPM/PGM payload (P6 = RGB, P5 = grayscale) to a
        numpy uint8 array of shape (h, w, 3) / (h, w). Pure numpy — no
        codec libraries. Formats this sandbox has no codec for (JPEG, PNG,
        audio, video) still raise NotImplementedError: on a real cluster
        swap in PIL/ffmpeg and nothing else changes."""
        import numpy as np

        magic = bytes(payload[:2])
        if magic not in (b"P5", b"P6"):
            raise NotImplementedError(
                f"no codec for magic {magic!r}: only binary PPM (P6) / PGM "
                "(P5) decode without image libraries; JPEG/PNG/audio/video "
                "need PIL/opencv/ffmpeg (absent in this environment)"
            )
        # Header: magic, width, height, maxval as ASCII tokens separated by
        # whitespace; '#' starts a comment running to end of line. A single
        # whitespace byte separates maxval from the raster.
        pos, vals = 2, []
        while len(vals) < 3:
            if pos >= len(payload):
                raise ValueError("truncated PPM header")
            b = payload[pos : pos + 1]
            if b.isspace():
                pos += 1
            elif b == b"#":
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
            else:
                start = pos
                while (
                    pos < len(payload)
                    and not payload[pos : pos + 1].isspace()
                ):
                    pos += 1
                vals.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = vals
        if not (0 < maxval < 256):
            raise ValueError(f"unsupported PPM maxval {maxval} (16-bit)")
        ch = 3 if magic == b"P6" else 1
        n = w * h * ch
        arr = np.frombuffer(payload, dtype=np.uint8, count=-1, offset=pos)
        if arr.size < n:
            raise ValueError(
                f"truncated PPM raster: {arr.size} bytes < {w}x{h}x{ch}"
            )
        arr = arr[:n]
        return arr.reshape((h, w, 3)) if ch == 3 else arr.reshape((h, w))

    def encode(arr) -> bytes:
        """Encode a (h, w, 3) / (h, w) uint8 array as binary P6 / P5."""
        import numpy as np

        a = np.asarray(arr, dtype=np.uint8)
        if a.ndim == 3 and a.shape[2] == 3:
            magic, h, w = b"P6", a.shape[0], a.shape[1]
        elif a.ndim == 2:
            magic, h, w = b"P5", a.shape[0], a.shape[1]
        else:
            raise ValueError(f"expected (h,w,3) or (h,w), got {a.shape}")
        return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()

    return decode, encode


decode_image, encode_ppm = _make_ppm_codec()


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-asset metadata via mapInPandas over the binary column.

    Extraction: length, magic bytes, 4 sampled bytes — the deterministic
    stand-in for a header parse (positions 0, n/4, n/2, 3n/4 of the payload,
    what a frame sampler would do with real media). Vectorized per Arrow
    batch; the worker function is a local closure so cloudpickle ships it BY
    VALUE — workers never need hdata_spark importable (the external-driver /
    --py-files situation).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            data = pdf["payload"]
            n = data.map(len)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "magic_hex": data.map(lambda b: b[:4].hex()),
                    "sample_b0": data.map(lambda b: b[0] if len(b) else None),
                    "sample_b1": [
                        b[len(b) // 4] if len(b) else None for b in data
                    ],
                    "sample_b2": [
                        b[len(b) // 2] if len(b) else None for b in data
                    ],
                    "sample_b3": [
                        b[3 * len(b) // 4] if len(b) else None for b in data
                    ],
                }
            )

    src = df.select(F.col("doc_id").cast("long"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(extract, schema=META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def frame_sample(
    df: DataFrame, payload_col: str = "payload", n_frames: int = 4
) -> DataFrame:
    """1->N frame sampling: each payload splits into `n_frames` contiguous
    byte segments (the last takes the remainder) — the deterministic
    stand-in for video frame / audio segment extraction, emitting
    (offset, length, sha256) per frame. Payloads shorter than `n_frames`
    bytes are dropped. mapInPandas UDTF shape: one input row -> n output
    rows, Arrow-batched, closure pickled by value."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "byte_offset": [],
                "frame_len": [], "frame_sha256": [],
            }
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                n = len(b)
                if n < n_frames:
                    continue
                step = n // n_frames
                for f_ in range(n_frames):
                    off = f_ * step
                    end = n if f_ == n_frames - 1 else off + step
                    seg = bytes(b[off:end])
                    out["doc_id"].append(int(did))
                    out["frame_idx"].append(f_)
                    out["byte_offset"].append(off)
                    out["frame_len"].append(len(seg))
                    out["frame_sha256"].append(hashlib.sha256(seg).hexdigest())
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": _pd.Series(out["frame_idx"], dtype="int32"),
                    "byte_offset": _pd.Series(out["byte_offset"], dtype="int64"),
                    "frame_len": _pd.Series(out["frame_len"], dtype="int64"),
                    "frame_sha256": _pd.Series(
                        out["frame_sha256"], dtype="object"
                    ),
                }
            )

    src = df.select(F.col("doc_id").cast("long"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(sample, schema=FRAME_SCHEMA)


HIST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bin", T.IntegerType()),
        T.StructField("n", T.LongType()),
    ]
)


def byte_histogram(
    df: DataFrame, payload_col: str = "payload", bins: int = 16
) -> DataFrame:
    """Per-asset byte-distribution feature extraction: count of payload
    bytes per value bin (bin = byte // (256/bins)); empty bins omitted.
    The numpy bincount is fully vectorized per asset — this is the
    feature-extract stage a media pipeline runs before embedding/dedup,
    and its output feeds the ANN/similarity family directly."""
    if bins < 1 or bins > 256 or 256 % bins:
        raise ValueError(
            f"bins={bins}: must divide 256 and lie in [1, 256] "
            f"(bin = byte // (256/bins) must stay within [0, bins))"
        )
    width = 256 // bins

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            ids, bs, ns = [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if arr.size == 0:
                    continue
                counts = np.bincount(arr // width, minlength=bins)
                nz = np.nonzero(counts)[0]
                ids.extend([int(did)] * len(nz))
                bs.extend(nz.tolist())
                ns.extend(counts[nz].tolist())
            yield _pd.DataFrame(
                {"doc_id": _pd.Series(ids, dtype="int64"),
                 "bin": _pd.Series(bs, dtype="int32"),
                 "n": _pd.Series(ns, dtype="int64")}
            )

    src = df.select(F.col("doc_id").cast("long"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(hist, schema=HIST_SCHEMA)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize a PPM/PGM payload (nearest-neighbor, pure numpy) and re-encode
    in the same format. Decode -> integer index-map resample -> encode;
    formats without a codec here (JPEG/PNG/...) raise NotImplementedError
    from `decode_image` — swap in PIL on a real cluster."""
    import numpy as np

    arr = decode_image(payload)
    in_h, in_w = arr.shape[0], arr.shape[1]
    rows = (np.arange(height) * in_h) // height
    cols = (np.arange(width) * in_w) // width
    return encode_ppm(arr[rows][:, cols])


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_pixel_bytes", T.LongType()),
        T.StructField("sum_byte", T.LongType()),
    ]
)


def decode_image_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-image decoded stats via the REAL PPM decode inside mapInPandas:
    (width, height, channels) parsed from the header, (n_pixel_bytes,
    sum_byte) computed over the DECODED raster — integer outputs so the
    DuckDB oracle hash-matches exactly. The codec pair is captured from the
    by-value factory (_make_ppm_codec), so workers never import this
    package. Arrow-batched; peak memory = batch_rows * avg_payload."""
    decode, _encode = _make_ppm_codec()

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "width", "height", "channels",
                "n_pixel_bytes", "sum_byte",
            )}
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                arr = decode(bytes(b))
                out["doc_id"].append(int(did))
                out["width"].append(int(arr.shape[1]))
                out["height"].append(int(arr.shape[0]))
                out["channels"].append(
                    int(arr.shape[2]) if arr.ndim == 3 else 1
                )
                out["n_pixel_bytes"].append(int(arr.size))
                out["sum_byte"].append(int(arr.astype(np.int64).sum()))
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(out["doc_id"], dtype="int64"),
                    "width": _pd.Series(out["width"], dtype="int32"),
                    "height": _pd.Series(out["height"], dtype="int32"),
                    "channels": _pd.Series(out["channels"], dtype="int32"),
                    "n_pixel_bytes": _pd.Series(
                        out["n_pixel_bytes"], dtype="int64"
                    ),
                    "sum_byte": _pd.Series(out["sum_byte"], dtype="int64"),
                }
            )

    src = df.select(F.col("doc_id").cast("long"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(stats, schema=DECODE_SCHEMA)


def with_ppm_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic P6 test image per doc: width = 4 + doc_id % 5, height =
    3 + doc_id % 4, raster byte i = (doc_id * 31 + 7 * i) % 256 — closed-form
    arithmetic a SQL oracle can reproduce without any codec. Built
    vectorized in mapInPandas (binary columns assemble worker-side, exactly
    where a lake read would place them)."""
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("payload", T.BinaryType())]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 5, 3 + did % 4
                n = w * h * 3
                raster = ((did * 31 + 7 * np.arange(n)) % 256).astype(np.uint8)
                payloads.append(
                    b"P6" + f"\n{w} {h}\n255\n".encode() + raster.tobytes()
                )
                ids.append(did)
            yield _pd.DataFrame(
                {"doc_id": _pd.Series(ids, dtype="int64"),
                 "payload": payloads}
            )

    return df.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        build, schema=out_schema
    )


def downsample_payloads(
    df: DataFrame, payload_col: str = "payload", stride: int = 4
) -> DataFrame:
    """Deterministic payload downsampling (every stride-th byte) — the
    codec-free stand-in for a resize/re-encode stage, keeping the
    binary-in/binary-out mapInPandas contract real and tested."""
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("payload", T.BinaryType())]
    )

    def down(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {"doc_id": pdf["doc_id"],
                 "payload": [bytes(b[::stride]) for b in pdf["payload"]]}
            )

    src = df.select(F.col("doc_id").cast("long"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(down, schema=out_schema)


def with_payload_from_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media payload: utf-8 bytes of the text column.

    Test harness for the binary plumbing — real pipelines read the binary
    column straight from the lake.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
