"""SnapshotTable — keyed MERGE upserts into an atomically-versioned lake table.

This is the engine's sink. On a production cluster the same interface maps
1:1 onto Iceberg (`MERGE INTO target USING batch ON t.repo=s.repo AND
t.path=s.path WHEN MATCHED ... WHEN NOT MATCHED ...` + Iceberg snapshot
commits and native column-ID schema evolution); in the sandbox (no Iceberg
runtime jar) we implement the identical semantics on plain parquet with a
manifest + atomic pointer — the same design Iceberg itself uses:

- data files are immutable parquet, hash-bucketed by key:
  ``bucket = pmod(xxhash64(repo, path), n_buckets)``;
- a *manifest* (JSON) maps bucket -> data files and records the logical
  schema, including rename lineage (``sources``: newest-first physical
  column names — the parquet-fallback analog of Iceberg column IDs);
- ``_latest`` is a pointer file updated via ``os.replace`` (atomic on POSIX):
  readers always see a complete snapshot, never a partial commit;
- MERGE is copy-on-write **per bucket**: only buckets touched by the batch
  are rewritten; untouched buckets carry their existing files into the new
  manifest verbatim. With 10^10 rows in 4096 buckets and an incremental batch
  touching 5% of buckets, 95% of the table is neither read nor written.

Idempotence anchor: every stored row carries ``_lsn`` (the LSN that produced
it). Merge resolves (repo, path) collisions by max ``_lsn``, so re-applying
an already-applied epoch is a no-op BY CONSTRUCTION, not merely by ledger
bookkeeping. (Reference counterpart: the keyed upsert path
hdata-jdbc/.../writer/jdbc/JDBCWriter.java:128-145, which is at-least-once
and arrival-order-dependent; stored-LSN LWW is what upgrades it to
exactly-once under replay.)

Delete semantics: the batch carries ``op``; a key whose winning event is a
delete is persisted as a TOMBSTONE row (``_op='d'``, hidden from `read()`),
not removed — so replaying an arbitrary old epoch can never resurrect a
deleted key (the tombstone's higher LSN wins). Within a batch a delete
cannot shadow a later reinsert either, because resolution is by LSN, not
arrival order. Tombstones are expired by `compact()`.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdata_spark.operators.dedup import lww_latest_window

class ConcurrentCommitError(RuntimeError):
    """Another writer committed the snapshot version this commit targeted."""


BASE_COLUMNS = ["repo", "path", "commit", "lang", "content"]
# Engine-maintained derived column: sha256 of content, computed by the
# replay pipeline's vectorized transform (north-star UDF; also the per-row
# verification invariant). Stored so change detection / audits never rescan
# content.
DERIVED_COLUMNS = ["content_sha256"]


@contextmanager
def _no_aqe(spark: SparkSession):
    """Run a block with AQE off.

    The per-epoch MERGE is a small fixed-shape job (bounded by live keys,
    not by events); AQE's per-stage materialize-and-replan adds latency on
    every one of its 3 exchanges and can never improve a plan whose sizes we
    already know. An incremental pipeline runs thousands of these commits —
    constant per-commit overhead is the part of the cost model that does NOT
    amortize at scale, so it is the part to strip.
    """
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _default_schema() -> list[dict]:
    return [
        {"name": c, "type": "string", "sources": [c]}
        for c in BASE_COLUMNS + DERIVED_COLUMNS
    ]


class SnapshotTable:
    """Bucketed, manifest-versioned parquet table with LWW MERGE + evolution."""

    def __init__(
        self,
        root: str,
        keys: Sequence[str] = ("repo", "path"),
        n_buckets: int = 64,
        bucket_cols: Sequence[str] | None = None,
    ) -> None:
        """`bucket_cols` (default: `keys`) — the subset of key columns the
        bucket hash is computed over. Must be a subset of `keys` so every
        version of a key colocates in one bucket (the merge invariant).
        Bucketing on a key PREFIX lets readers that only know that prefix
        bucket-prune: e.g. the MinHash band index keyed by
        (band_idx, band_sig, doc_id) buckets on doc_id alone, so its
        replace/delete paths (which know only doc_ids) read the batch's
        buckets instead of scanning the whole index."""
        self.root = root
        self.keys = list(keys)
        self.bucket_cols = list(bucket_cols) if bucket_cols else list(keys)
        if not set(self.bucket_cols) <= set(self.keys):
            raise ValueError(
                f"bucket_cols {self.bucket_cols} must be a subset of keys "
                f"{self.keys}: a key's versions must colocate in one bucket"
            )
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        # An EXISTING table's layout is authoritative: keys/n_buckets are
        # recorded in the manifest at first commit, and reopening with
        # different constructor args must not silently re-bucket (a merge
        # planned with the wrong bucket count would miss stored rows and
        # duplicate keys). Stored layout wins over constructor defaults.
        v = self.current_version()
        if v > 0:
            m = self._read_manifest(v)
            if "keys" in m:
                self.keys = list(m["keys"])
            if "n_buckets" in m:
                self.n_buckets = int(m["n_buckets"])
            # Older manifests predate bucket_cols: their hash covered keys.
            self.bucket_cols = list(m.get("bucket_cols", self.keys))

    # ---------------- manifest / pointer plumbing ----------------

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_latest")

    def current_version(self) -> int:
        """Latest committed snapshot.

        The pointer is the fast path; the manifests directory is the truth.
        A crash between the exclusive manifest claim (os.link) and the
        pointer swap leaves an ORPHAN manifest one version ahead — since
        only ONE writer can ever claim a version, that orphan IS a
        committed snapshot whose publish was lost, so it is adopted here
        (otherwise every later commit of that version would collide
        forever). The next successful commit re-advances the pointer.
        """
        try:
            with open(self._pointer) as f:
                ptr = int(f.read().strip())
        except FileNotFoundError:
            ptr = 0
        v = ptr
        while os.path.exists(self._manifest_path(v + 1)):
            v += 1
        return v

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "manifests", f"v{version:08d}.json")

    def _read_manifest(self, version: int) -> dict:
        if version == 0:
            spec = _default_schema()
            return {
                "buckets": {},
                "schema": spec,
                "gen": 0,
                "gen_specs": {"0": spec},
                "file_gens": {},
                "delta_files": [],
            }
        with open(self._manifest_path(version)) as f:
            m = json.load(f)
        m.setdefault("schema", _default_schema())
        m.setdefault("gen", 0)
        m.setdefault("gen_specs", {"0": m["schema"]})
        m.setdefault("file_gens", {})
        m.setdefault("delta_files", [])
        return m

    def _commit(self, version: int, manifest: dict) -> None:
        """Atomic snapshot commit with optimistic concurrency.

        A commit claims `version` by creating its manifest with O_EXCL —
        exactly one of two racing writers wins (same optimistic protocol as
        an Iceberg catalog swap); the loser gets ConcurrentCommitError and
        must re-read + retry on top of the winner's snapshot. The pointer
        swap afterwards is the atomic publish (os.replace).
        """
        if version != self.current_version() + 1:
            raise ConcurrentCommitError(
                f"stale snapshot: committing v{version} but table is at "
                f"v{self.current_version()}"
            )
        manifest["version"] = version
        manifest["keys"] = list(self.keys)
        manifest["n_buckets"] = self.n_buckets
        manifest["bucket_cols"] = list(self.bucket_cols)
        # Sticky until compaction: a manifest that was ever marked
        # has_deltas without per-file tracking (legacy) keeps resolving at
        # read time — conservative direction (extra window, never wrong).
        manifest["has_deltas"] = bool(manifest.get("delta_files")) or bool(
            manifest.get("has_deltas")
        )
        path = self._manifest_path(version)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            # exclusive link: fails if another writer claimed this version
            os.link(tmp, path)
        except FileExistsError:
            os.remove(tmp)
            raise ConcurrentCommitError(
                f"lost race for snapshot v{version}: another writer committed"
            ) from None
        os.remove(tmp)
        ptr_tmp = self._pointer + f".tmp-{uuid.uuid4().hex}"
        with open(ptr_tmp, "w") as f:
            f.write(str(version))
        os.replace(ptr_tmp, self._pointer)  # atomic snapshot swap

    def schema_spec(self) -> list[dict]:
        return self._read_manifest(self.current_version())["schema"]

    def columns(self) -> list[str]:
        return [c["name"] for c in self.schema_spec()]

    def max_stored_lsn(self, spark: SparkSession) -> int:
        """Highest _lsn in the current snapshot (0 for an empty table).

        Column-pruned single-column agg — parquet row-group stats keep this
        a near-footer-only scan even on a wide table.
        """
        row = self.read_internal(spark).agg(F.max("_lsn")).collect()[0]
        return int(row[0]) if row[0] is not None else 0

    # ---------------- reads ----------------

    def _bucket_expr(self):
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in self.bucket_cols]),
            F.lit(self.n_buckets),
        ).cast("int")

    def _empty(self, spark: SparkSession, schema_spec: list[dict]) -> DataFrame:
        fields = [
            T.StructField(c["name"], _parse_type(c["type"])) for c in schema_spec
        ] + [
            T.StructField("_lsn", T.LongType()),
            T.StructField("_op", T.StringType()),
            T.StructField("bucket", T.IntegerType()),
        ]
        return spark.createDataFrame([], T.StructType(fields))

    def read_internal(
        self,
        spark: SparkSession,
        buckets: Sequence[int] | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Snapshot incl. _lsn/bucket; bucket-pruned when asked.

        Bucket pruning is manifest-level file pruning — pruned buckets' files
        are never opened (equivalent of Iceberg partition pruning; reference
        analog: HBase region-range scan, hdata-hbase/.../HBaseSplitter.java:57-133).
        Rename lineage resolves via coalesce over the column's historical
        physical names (newest first) — the parquet stand-in for column IDs.

        `version` time-travels to an older snapshot (manifests are retained;
        valid until `vacuum()` expires that snapshot's files, exactly
        Iceberg's snapshot-expiry contract).
        """
        m = self._read_manifest(
            self.current_version() if version is None else version
        )
        spec = m["schema"]
        files_by_bucket = m["buckets"]
        if buckets is not None:
            wanted = {str(b) for b in buckets}
            files_by_bucket = {b: fs for b, fs in files_by_bucket.items() if b in wanted}
        files = [f for fs in files_by_bucket.values() for f in fs]
        if not files:
            return self._empty(spark, spec)
        # Files are grouped by schema GENERATION (bumped on every
        # evolve_schema — the parquet-fallback analog of Iceberg's per-file
        # schema id). Each generation shares one physical schema, is read
        # without any footer merging, and is projected to the CURRENT
        # logical schema (rename lineage via `sources` coalesce, widen via
        # cast); generations then union. This is what makes add/rename/widen
        # metadata-only: old files are never rewritten, just re-projected —
        # and type-widened generations can coexist (parquet mergeSchema
        # cannot merge an int32 file with an int64 one).
        file_gens = m["file_gens"]
        by_gen: dict[int, list[str]] = {}
        for f in files:
            by_gen.setdefault(int(file_gens.get(f, 0)), []).append(f)
        frames = []
        for _g, fs in sorted(by_gen.items()):
            raw = spark.read.parquet(*[os.path.join(self.root, f) for f in fs])
            present = set(raw.columns)
            cols = []
            for c in spec:
                sources = [s for s in c["sources"] if s in present]
                if not sources:
                    cols.append(F.lit(None).cast(c["type"]).alias(c["name"]))
                elif len(sources) == 1:
                    cols.append(F.col(sources[0]).cast(c["type"]).alias(c["name"]))
                else:
                    cols.append(
                        F.coalesce(*[F.col(s) for s in sources])
                        .cast(c["type"])
                        .alias(c["name"])
                    )
            frames.append(raw.select(*cols, F.col("_lsn"), F.col("_op")))
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        # `bucket` is directory-encoded at write time (partitionBy) and a pure
        # function of the keys, so recompute it instead of relying on
        # partition discovery over explicit file paths.
        out = out.withColumn("bucket", self._bucket_expr())
        if m.get("has_deltas"):
            # Merge-on-read resolution: fast-append commits leave multiple
            # versions of a key across base + delta files; the highest-LSN
            # row wins at read time (row_number, not a semi join — re-applied
            # epochs can duplicate an exact (key, lsn) row and exactly one
            # copy must survive). This is the MOR read-amplification trade:
            # reads pay one keyed shuffle until `compact()` folds the deltas.
            out = lww_latest_window(out, keys=self.keys, order_col="_lsn")
        return out

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Public final-state view: tombstones filtered, internals dropped.

        `version` = time travel (`None` = current snapshot).
        """
        return (
            self.read_internal(spark, version=version)
            .filter(F.col("_op") != F.lit("d"))
            .drop("_lsn", "_op", "bucket")
        )

    def _align_to_current(self, df: DataFrame) -> DataFrame:
        """Project a (possibly older-version) internal frame to the current
        logical schema: resolve renames via source lineage, cast widened
        types, null-fill columns the old version lacked."""
        present = set(df.columns)
        cols = []
        for c in self.schema_spec():
            sources = [s for s in c["sources"] if s in present]
            if not sources:
                cols.append(F.lit(None).cast(c["type"]).alias(c["name"]))
            elif len(sources) == 1:
                cols.append(F.col(sources[0]).cast(c["type"]).alias(c["name"]))
            else:
                cols.append(
                    F.coalesce(*[F.col(s) for s in sources])
                    .cast(c["type"])
                    .alias(c["name"])
                )
        return df.select(*cols, "_lsn", "_op")

    def changes_between(
        self, spark: SparkSession, v_from: int, v_to: int | None = None
    ) -> DataFrame:
        """Change data feed between two snapshots: one row per key whose
        state differs, classified insert / update / delete.

        The downstream face of a CDC engine — consumers incrementally follow
        the target table the same way this engine follows its source WAL.
        Implemented as a keyed full-outer join of the two snapshots' internal
        states (per-bucket co-partitioned at scale); `_change_lsn` carries
        the LSN that produced the new state, so feeds compose transitively.

        Both sides are projected to the CURRENT logical schema first (rename
        lineage + widen casts + null-fill), so a feed spanning a schema
        evolution boundary is well-formed.
        """
        a = self._align_to_current(
            self.read_internal(spark, version=v_from)
        ).alias("a")
        b = self._align_to_current(
            self.read_internal(spark, version=v_to)
        ).alias("b")
        cond = None
        for k in self.keys:
            eq = F.col(f"a.{k}") == F.col(f"b.{k}")
            cond = eq if cond is None else cond & eq
        j = a.join(b, cond, "full_outer")
        a_live = (F.col("a._lsn").isNotNull()) & (F.col("a._op") != "d")
        b_live = (F.col("b._lsn").isNotNull()) & (F.col("b._op") != "d")
        change = (
            F.when(~a_live & b_live, F.lit("insert"))
            # delete covers both a visible tombstone in b AND a key that is
            # entirely absent from b (tombstone expired by compaction)
            .when(a_live & ~b_live, F.lit("delete"))
            .when(
                a_live & b_live & (F.col("b._lsn") > F.col("a._lsn")),
                F.lit("update"),
            )
            .otherwise(F.lit(None))
        )
        logical = self.columns()
        # Payload comes from the NEW side whenever its row exists — a
        # coalesce would resurrect the old value for updates that set a
        # column to NULL. Only deletes-by-absence fall back to the old row.
        b_present = F.col("b._lsn").isNotNull()
        payload_side = [
            F.when(b_present, F.col(f"b.{c}")).otherwise(F.col(f"a.{c}")).alias(c)
            for c in logical
            if c not in self.keys
        ]
        return (
            j.select(
                change.alias("change_type"),
                *[
                    F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).alias(k)
                    for k in self.keys
                ],
                *payload_side,
                # The LSN that PRODUCED the new state. NULL for a delete
                # whose tombstone was already expired (provenance unknown —
                # consumers must assign their own ordering for those).
                F.col("b._lsn").alias("_change_lsn"),
            )
            .filter(F.col("change_type").isNotNull())
        )

    # ---------------- MERGE ----------------

    def merge(
        self,
        spark: SparkSession,
        batch: DataFrame,
        affected: Sequence[int] | None = None,
        batch_deduped: bool = False,
    ) -> dict:
        """MERGE batch into the table; returns commit stats.

        `batch` columns: logical table columns + `op` ('insert' | 'update' |
        'delete') + `lsn`. Pass ``batch_deduped=True`` only when the batch is
        already LWW-unique per key (the replay pipeline's contract);
        otherwise merge dedups it first.

        Resolution is a single shuffle-hash FULL OUTER join between the
        stored rows (unique per key by construction) and the batch winners
        (unique per key): the incoming row wins iff its LSN is strictly
        higher than the stored one — equal LSN means the same event, already
        applied, so replays are no-ops. This is exactly the `MERGE INTO ...
        WHEN MATCHED AND s.lsn > t.lsn` plan Iceberg would produce; with
        storage-partitioned join both sides would not even shuffle (both are
        bucketed by key — noted for the Iceberg sink).

        `affected` (optional): the batch's distinct bucket ids, if the caller
        already knows them (replay derives them from its metrics pass) —
        skips one collect job.
        """
        version = self.current_version()
        manifest = self._read_manifest(version)
        if affected is not None and not list(affected):
            # Empty batch: version-bump-only commit (keeps epoch lineage).
            self._commit(version + 1, manifest)
            return {"version": version + 1, "applied_buckets": 0, "buckets": []}
        spec = manifest["schema"]
        logical = [c["name"] for c in spec]

        # Tolerate batches missing trailing logical columns (e.g. hand-built
        # test batches without derived/evolved columns): fill with nulls.
        for name in logical:
            if name not in batch.columns:
                spec_t = next(c["type"] for c in spec if c["name"] == name)
                batch = batch.withColumn(name, F.lit(None).cast(spec_t))

        if not batch_deduped:
            # Window variant, NOT the semi-join plan: direct callers (full
            # loads, jobspec upserts) may carry TIED lsn values — e.g.
            # overwrite() stamps every row lsn=0 — and a semi join on the
            # max lsn keeps every tied row, breaking the table's
            # one-row-per-key invariant. row_number keeps exactly one.
            batch = lww_latest_window(batch, self.keys, "lsn")
        batch = batch.withColumn("bucket", self._bucket_expr())
        if affected is None:
            # Affected buckets: tiny collect (<= n_buckets ints).
            affected = sorted(
                r["bucket"] for r in batch.select("bucket").distinct().collect()
            )
        affected = sorted(affected)
        if not affected:
            self._commit(version + 1, manifest)
            return {"version": version + 1, "applied_buckets": 0, "buckets": []}

        incoming = batch.select(*logical, "lsn", "op", "bucket")
        has_stored = any(
            manifest["buckets"].get(str(b)) for b in affected
        )
        # Deletes persist as TOMBSTONE rows (_op='d') rather than row
        # absence: replaying an arbitrary old epoch can then never resurrect
        # a deleted key — the tombstone's higher LSN wins. (Compacted-topic /
        # Iceberg-delete-file semantics; expired by `compact()`.)
        if has_stored:
            stored = self.read_internal(spark, buckets=affected).alias("t")
            s = incoming.alias("s")
            cond = None
            for k in self.keys:
                eq = F.col(f"t.{k}") == F.col(f"s.{k}")
                cond = eq if cond is None else cond & eq
            j = stored.join(s.hint("shuffle_hash"), cond, "full_outer")
            # Incoming wins iff STRICTLY newer; equal LSN == same event,
            # already applied -> stored row wins (idempotent replays).
            take_s = F.col("s.lsn").isNotNull() & (
                F.col("t._lsn").isNull() | (F.col("s.lsn") > F.col("t._lsn"))
            )
            payload = [c for c in logical if c not in self.keys]
            survivors = j.select(
                *[
                    F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k)
                    for k in self.keys
                ],
                *[
                    F.when(take_s, F.col(f"s.{c}"))
                    .otherwise(F.col(f"t.{c}"))
                    .alias(c)
                    for c in payload
                ],
                F.when(take_s, F.col("s.lsn"))
                .otherwise(F.col("t._lsn"))
                .alias("_lsn"),
                F.when(
                    take_s,
                    F.when(F.col("s.op") == "delete", F.lit("d")).otherwise(
                        F.lit("u")
                    ),
                )
                .otherwise(F.col("t._op"))
                .alias("_op"),
                F.coalesce(F.col("s.bucket"), F.col("t.bucket")).alias("bucket"),
            ).select(*logical, "_lsn", "_op", "bucket")
        else:
            # Empty-target fast path (initial load / fresh buckets).
            survivors = incoming.select(
                *logical,
                F.col("lsn").alias("_lsn"),
                F.when(F.col("op") == "delete", F.lit("d"))
                .otherwise(F.lit("u"))
                .alias("_op"),
                "bucket",
            )

        # Copy-on-write: rewrite ONLY affected buckets as a new file set.
        out_rel = os.path.join("data", f"v{version + 1:08d}-{uuid.uuid4().hex[:8]}")
        out_abs = os.path.join(self.root, out_rel)
        with _no_aqe(spark):
            (
                # one task per affected bucket: write parallelism tracks the
                # merge width, and each bucket lands as a single file
                survivors.repartition(len(affected), F.col("bucket"))
                .write.partitionBy("bucket")
                .mode("overwrite")
                .parquet(out_abs)
            )

        new_buckets = dict(manifest["buckets"])
        file_gens = dict(manifest["file_gens"])
        delta_files = set(manifest["delta_files"])
        gen = int(manifest["gen"])
        written = 0
        for b in affected:
            for old in new_buckets.get(str(b), []):
                file_gens.pop(old, None)
                delta_files.discard(old)
            bdir = os.path.join(out_abs, f"bucket={b}")
            if os.path.isdir(bdir):
                fs = [
                    os.path.join(out_rel, f"bucket={b}", fn)
                    for fn in sorted(os.listdir(bdir))
                    if fn.endswith(".parquet")
                ]
            else:
                fs = []  # bucket fully deleted
            new_buckets[str(b)] = fs
            for f in fs:
                file_gens[f] = gen
            written += len(fs)
        manifest.update(
            buckets=new_buckets,
            file_gens=file_gens,
            schema=spec,
            delta_files=sorted(delta_files),
        )
        self._commit(version + 1, manifest)
        return {
            "version": version + 1,
            "buckets": affected,
            "applied_buckets": len(affected),
            "files_written": written,
        }

    def register_deltas(self, files_by_bucket: dict[int, list[str]]) -> dict:
        """Fast-append commit (merge-on-read): register already-written delta
        files as part of their buckets — a METADATA-ONLY snapshot commit, no
        Spark job, no read of stored data.

        This is Iceberg's fast-append / Hudi's MOR ingest path: the replay
        loop writes one epoch-and-bucket-partitioned file set for a whole
        run, then commits each epoch as a manifest append in strict epoch
        order (milliseconds each, driver-side). Per-epoch commit cost becomes
        O(1) in table size — the term that does NOT amortize at 10^10 events
        is gone. Readers resolve key versions by stored LSN (read_internal);
        `compact()` folds deltas back to one row per key.

        `files_by_bucket`: {bucket: [paths relative to table root]} — files
        must already carry the logical columns + `_lsn` + `_op`.
        """
        version = self.current_version()
        manifest = self._read_manifest(version)
        new_buckets = dict(manifest["buckets"])
        file_gens = dict(manifest["file_gens"])
        gen = int(manifest["gen"])
        delta_files = list(manifest["delta_files"])
        n_files = 0
        for b, fs in files_by_bucket.items():
            if not fs:
                continue
            new_buckets[str(b)] = list(new_buckets.get(str(b), [])) + list(fs)
            for f in fs:
                file_gens[f] = gen
            delta_files.extend(fs)
            n_files += len(fs)
        manifest.update(
            buckets=new_buckets, file_gens=file_gens, delta_files=delta_files
        )
        self._commit(version + 1, manifest)
        return {
            "version": version + 1,
            "applied_buckets": len(files_by_bucket),
            "files_registered": n_files,
        }

    def delta_file_count(self) -> int:
        """Number of UNCOMPACTED delta files (the MOR compaction trigger);
        0 after compact()."""
        m = self._read_manifest(self.current_version())
        return len(m["delta_files"])

    def data_file_count(self) -> int:
        m = self._read_manifest(self.current_version())
        return sum(len(fs) for fs in m["buckets"].values())

    def overwrite(self, spark: SparkSession, df: DataFrame, lsn_col=None) -> dict:
        """Full load. df has the logical columns (+ optional lsn column).

        The derived content_sha256 is computed here when absent, so base
        loads get the same invariant column the replay pipeline maintains.
        """
        if "content_sha256" not in df.columns and "content" in df.columns:
            df = df.withColumn("content_sha256", F.sha2(F.col("content"), 256))
        lsn = F.col(lsn_col) if lsn_col else F.lit(0).cast("long")
        cols = [c for c in self.columns() if c in df.columns]
        batch = df.select(*cols, lsn.alias("lsn"), F.lit("insert").alias("op"))
        return self.merge(spark, batch)

    # ---------------- schema evolution ----------------

    def evolve_schema(self, new_spec: list[dict]) -> int:
        """Commit a new logical schema (add / rename / widen) WITHOUT data
        rewrite — metadata-only, like Iceberg. `new_spec` entries:
        {"name", "type", "sources": [newest_physical, ...older names]}.
        """
        version = self.current_version()
        manifest = self._read_manifest(version)
        if manifest["schema"] == new_spec:
            # Idempotent: crash-resume may re-drive the same spec (the
            # registry persisted but the table commit didn't land); a no-op
            # re-apply must not churn versions or generations.
            return version
        manifest["schema"] = new_spec
        gen = int(manifest["gen"]) + 1
        manifest["gen"] = gen
        manifest["gen_specs"] = {**manifest["gen_specs"], str(gen): new_spec}
        self._commit(version + 1, manifest)
        return version + 1

    # ---------------- maintenance ----------------

    def compact(
        self, spark: SparkSession, expire_tombstones_below_lsn: int | None = None
    ) -> dict:
        """Rewrite the whole table: drop expired tombstones, 1 file/bucket.

        Only safe when no future replay can carry an LSN below the expiry
        watermark (i.e. watermark <= ledger's lowest uncommitted LSN) —
        exactly Iceberg's snapshot-expiry contract. With no watermark, all
        tombstones are kept and this is a pure small-file compaction.
        """
        version = self.current_version()
        manifest = self._read_manifest(version)
        cur = self.read_internal(spark)
        if expire_tombstones_below_lsn is not None:
            cur = cur.filter(
                (F.col("_op") != "d")
                | (F.col("_lsn") >= F.lit(expire_tombstones_below_lsn))
            )
        out_rel = os.path.join("data", f"c{version + 1:08d}-{uuid.uuid4().hex[:8]}")
        out_abs = os.path.join(self.root, out_rel)
        (
            cur.repartition(self.n_buckets, F.col("bucket"))
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(out_abs)
        )
        new_buckets = {
            str(b): fs for b, fs in list_bucket_files(out_abs, out_rel).items()
        }
        # Post-compaction all live files share one physical schema again
        # (current generation) and all key versions are folded (MOR deltas
        # resolved by read_internal during the rewrite).
        gen = int(manifest["gen"])
        self._commit(
            version + 1,
            {
                "buckets": new_buckets,
                "schema": manifest["schema"],
                "gen": gen,
                "gen_specs": {str(gen): manifest["schema"]},
                "file_gens": {
                    f: gen for fs in new_buckets.values() for f in fs
                },
                "delta_files": [],
            },
        )
        return {"version": version + 1, "buckets": len(new_buckets)}

    def vacuum(self) -> int:
        """Delete data files unreferenced by the current manifest."""
        live = {
            os.path.join(self.root, f)
            for fs in self._read_manifest(self.current_version())["buckets"].values()
            for f in fs
        }
        removed = 0
        data_root = os.path.join(self.root, "data")
        for dirpath, _dirnames, filenames in os.walk(data_root, topdown=False):
            for fn in filenames:
                p = os.path.join(dirpath, fn)
                if p not in live and fn.endswith(".parquet"):
                    os.remove(p)
                    removed += 1
            if dirpath != data_root and not os.listdir(dirpath):
                shutil.rmtree(dirpath, ignore_errors=True)
        return removed


def list_bucket_files(abs_dir: str, rel_dir: str) -> dict[int, list[str]]:
    """{bucket: sorted relative parquet paths} for a `bucket=N`-partitioned
    parquet dataset staged at `abs_dir` (= <table.root>/<rel_dir>).

    The one listing used by every stager of the delta layout — the batch
    replay run (per epoch), the streaming micro-batch, and compaction — so
    the physical layout contract (dir naming, file suffix) lives in exactly
    one place.
    """
    out: dict[int, list[str]] = {}
    for entry in sorted(os.listdir(abs_dir)):
        if not entry.startswith("bucket="):
            continue
        b = int(entry.split("=", 1)[1])
        out[b] = [
            os.path.join(rel_dir, entry, fn)
            for fn in sorted(os.listdir(os.path.join(abs_dir, entry)))
            if fn.endswith(".parquet")
        ]
    return out


def delta_footer_stats(
    root: str, files_by_bucket: dict[int, list[str]], lsn_col: str = "_lsn"
) -> list[dict]:
    """Per-bucket (applied_events, max `lsn_col`) for just-staged delta files,
    read from the PARQUET FOOTERS — zero Spark jobs.

    The streaming micro-batch needs per-bucket counts + max LSN for its
    metrics/ledger row; launching a read job over files the same trigger just
    wrote is a fixed per-trigger cost that caps WAL-tail throughput. Row
    counts and int64 min/max column statistics are already in each file's
    footer, so the driver reads them directly (the files are local/lake
    metadata reads, one per staged file — bounded by n_buckets per trigger).
    Falls back to a pyarrow single-column read (still no Spark job) for any
    row group whose writer skipped statistics.
    """
    import pyarrow.parquet as pq

    out: list[dict] = []
    for bucket, rels in sorted(files_by_bucket.items()):
        n = 0
        mx: int | None = None
        for rel in rels:
            path = os.path.join(root, rel)
            pf = pq.ParquetFile(path)
            md = pf.metadata
            n += md.num_rows
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            idx = names.index(lsn_col)
            need_fallback = False
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    need_fallback = True
                    break
                mx = int(st.max) if mx is None else max(mx, int(st.max))
            if need_fallback:
                col = pf.read(columns=[lsn_col]).column(lsn_col)
                if len(col):
                    import pyarrow.compute as pc

                    fmx = pc.max(col).as_py()
                    if fmx is not None:
                        mx = fmx if mx is None else max(mx, int(fmx))
        if n:
            # A bucket with rows but no resolvable max LSN means lsn_col was
            # all-NULL — a contract violation (_lsn is non-null by
            # construction). Raising beats silently dropping the bucket,
            # which would undercount applied_events in the metrics/ledger
            # row relative to the Spark aggregation this path replaced.
            if mx is None:
                raise ValueError(
                    f"delta bucket {bucket}: {n} rows but no resolvable "
                    f"max({lsn_col}) — {lsn_col} must be non-null"
                )
            out.append(
                {"bucket": bucket, "applied_events": n, "max_applied_lsn": mx}
            )
    return out


def _parse_type(type_str: str) -> T.DataType:
    mapping = {
        "string": T.StringType(),
        "int": T.IntegerType(),
        "integer": T.IntegerType(),
        "bigint": T.LongType(),
        "long": T.LongType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "boolean": T.BooleanType(),
        "timestamp": T.TimestampType(),
        "date": T.DateType(),
    }
    if type_str in mapping:
        return mapping[type_str]
    raise ValueError(f"unsupported type in schema spec: {type_str}")
