"""Multimodal (image/audio/video) column plumbing over opaque binary payloads.

Media assets are carried as ``binary`` columns with typed metadata structs —
the lake-native pattern (same as Iceberg/Parquet BLOB columns). All
per-asset work runs through Arrow-batched ``mapInPandas``: the Spark-side
contract (schema in/out, batch shape, partitioning) is real and tested; the
actual codec calls are STUBBED because the sandbox has no image/audio
libraries (see ``decode_image``) — swap the stub body for PIL/ffmpeg on a
real cluster and nothing else changes.

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


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to pixels. STUB: no codec libs in sandbox.

    On a real cluster:  `from PIL import Image; return Image.open(BytesIO(payload))`.
    """
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not present in this environment; "
        "the Spark-side plumbing (schema, batching, partitioning) is real"
    )


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
    """Resize an image payload. STUB: no codec libs in sandbox (see
    decode_image); on a real cluster: PIL decode -> resize -> re-encode."""
    raise NotImplementedError(
        "image resize requires PIL/opencv, not present in this environment; "
        "downsample_payloads demonstrates the real Spark-side plumbing"
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
