"""Snapshot tables: the Iceberg COMMIT PROTOCOL over parquet, honestly.

What this is: Apache Iceberg's core correctness mechanism — immutable
data files + immutable per-version metadata manifests + an atomic
compare-and-swap publish of the next metadata version — implemented
directly on the Hadoop FileSystem API. It gives the properties the
100-TB multi-job story needs:

- **snapshot isolation**: a reader resolves ONE manifest (latest or a
  pinned version) and reads exactly that file set; concurrent commits
  publish new manifests and never mutate old data or old manifests, so
  an in-flight read is never torn;
- **atomic commits with optimistic concurrency**: the next version is
  claimed by ``FileSystem.rename(tmp, v{N}.json)`` — atomic and
  no-overwrite on HDFS *and* on the local FS (rename returns false when
  the destination exists) — a losing writer re-reads the winner's
  manifest, REBASES its append on the new file list, and retries at
  N+1, exactly Iceberg's HadoopTableOperations commit loop;
- **time travel**: every published version stays readable;
- **crash safety**: data directories are written first and become
  visible only through a published manifest — a killed writer leaves
  orphan data dirs that no reader ever lists (and
  ``vacuum_orphans`` removes).

What this is NOT (documented non-goals, kept out of scope on purpose):
the Iceberg *spec* — Avro manifest lists, partition spec / schema
evolution metadata, a REST/Hive catalog, row-level deletes. On a
cluster with real Iceberg jars the call sites swap to the Iceberg
catalog unchanged; this module exists so the engine's snapshot/commit
semantics are REAL and testable in any plain-filesystem environment,
not a naming convention. (Reference behavior anchored by
``plans/lineage.py``'s per-partition commit log, which stays the
lineage/metrics layer; this module is the table-level isolation layer.)
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Raised when max_retries CAS attempts all lost the race."""


class SnapshotTable:
    """A versioned parquet table with atomic snapshot commits.

    Layout::

        base/
          data/<uuid>/part-*.parquet   immutable, written once
          metadata/v{N}.json           immutable manifest for version N
          metadata/tmp-*.json          in-flight commit attempts

    Manifest schema: ``{"version": N, "parent": N-1 | None,
    "operation": "append" | "overwrite", "files": [data dir names],
    "summary": {...}, "committed_at": epoch}``.
    """

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = base.rstrip("/")
        jvm = spark.sparkContext._jvm
        self._jvm = jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(self.base).getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        self._fs.mkdirs(self._Path(f"{self.base}/data"))
        self._fs.mkdirs(self._Path(f"{self.base}/metadata"))

    # ---- metadata IO ----------------------------------------------------
    def _meta(self, name: str) -> str:
        return f"{self.base}/metadata/{name}"

    def _write_file(self, path: str, payload: str) -> None:
        out = self._fs.create(self._Path(path), True)
        try:
            out.write(payload.encode("utf-8"))
        finally:
            out.close()

    def _read_file(self, path: str) -> str:
        ins = self._fs.open(self._Path(path))
        try:
            # manifests are small; commons-io ships with Spark
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                ins, "UTF-8"
            )
        finally:
            ins.close()

    def versions(self) -> list[int]:
        it = self._fs.listStatus(self._Path(f"{self.base}/metadata"))
        out = []
        for st in it:
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def snapshot(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed snapshot under {self.base}")
        return json.loads(self._read_file(self._meta(f"v{v}.json")))

    # ---- commits ---------------------------------------------------------
    def _write_data(self, df: DataFrame) -> str:
        name = uuid.uuid4().hex
        df.write.mode("overwrite").parquet(f"{self.base}/data/{name}")
        return name

    def _try_publish(self, manifest: dict) -> bool:
        """CAS: rename(tmp, vN.json) — atomic, fails if vN exists."""
        tmp = self._meta(f"tmp-{uuid.uuid4().hex}.json")
        self._write_file(tmp, json.dumps(manifest))
        ok = bool(
            self._fs.rename(
                self._Path(tmp),
                self._Path(self._meta(f"v{manifest['version']}.json")),
            )
        )
        if not ok:
            self._fs.delete(self._Path(tmp), False)
        return ok

    def _commit(
        self, df: DataFrame, operation: str, summary: dict | None,
        max_retries: int,
    ) -> int:
        data_name = self._write_data(df)  # expensive part, done ONCE
        for _ in range(max_retries):
            cur = self.current_version()
            if operation == "append" and cur is not None:
                files = self.snapshot(cur)["files"] + [data_name]
            else:
                files = [data_name]
            manifest = {
                "version": (cur or 0) + 1,
                "parent": cur,
                "operation": operation,
                "files": files,
                "summary": summary or {},
                "committed_at": time.time(),
            }
            if self._try_publish(manifest):
                return manifest["version"]
            # lost the race: re-resolve the winner's manifest and rebase
        raise CommitConflict(
            f"{operation} to {self.base} lost {max_retries} CAS races"
        )

    def commit_append(
        self, df: DataFrame, summary: dict | None = None, max_retries: int = 20
    ) -> int:
        """Publish ``df`` as a new snapshot appended to the current file
        set. Returns the committed version."""
        return self._commit(df, "append", summary, max_retries)

    def commit_overwrite(
        self, df: DataFrame, summary: dict | None = None, max_retries: int = 20
    ) -> int:
        """Publish ``df`` as a new snapshot REPLACING the table content.
        Old versions stay readable (time travel); old data files are not
        deleted until ``vacuum_orphans`` / retention runs."""
        return self._commit(df, "overwrite", summary, max_retries)

    # ---- reads -----------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        """Read one snapshot (latest by default) — exactly its file set,
        resolved once; later commits cannot tear this plan."""
        snap = self.snapshot(version)
        paths = [f"{self.base}/data/{f}" for f in snap["files"]]
        return self.spark.read.parquet(*paths)

    # ---- resumable ingestion ----------------------------------------------
    def committed_partitions(self) -> set[str]:
        """Partition keys recorded in committed snapshot summaries."""
        return {
            self.snapshot(v)["summary"].get("partition_key")
            for v in self.versions()
        } - {None}

    # ---- maintenance -----------------------------------------------------
    def vacuum_orphans(self) -> list[str]:
        """Delete data dirs referenced by NO published manifest (crashed
        writers, lost CAS attempts) and stale tmp manifests. Never
        touches any published version's files."""
        live: set[str] = set()
        for v in self.versions():
            live.update(self.snapshot(v)["files"])
        removed = []
        for st in self._fs.listStatus(self._Path(f"{self.base}/data")):
            name = st.getPath().getName()
            if name not in live:
                self._fs.delete(st.getPath(), True)
                removed.append(f"data/{name}")
        for st in self._fs.listStatus(self._Path(f"{self.base}/metadata")):
            name = st.getPath().getName()
            if name.startswith("tmp-"):
                self._fs.delete(st.getPath(), False)
                removed.append(f"metadata/{name}")
        return removed


def run_resumable_snapshots(
    spark: SparkSession,
    partition_keys: list[str],
    make_df,
    base: str,
) -> list[int]:
    """``plans/lineage.run_resumable``'s twin over SnapshotTable: each
    input partition commits as ONE append snapshot whose summary records
    the partition key, so a killed run resumes from the last COMMITTED
    snapshot — already-committed keys are skipped, a partition that died
    mid-write left only an orphan data dir no reader ever lists (vacuum
    removes it), and concurrent readers see every intermediate state as
    a consistent snapshot instead of a half-visible directory tree.

    Returns the versions committed by THIS run. Exactly-once per
    partition key holds because the skip set is derived from committed
    manifests only — the same replay contract as the lineage commit log,
    now with table-level isolation."""
    table = SnapshotTable(spark, base)
    done = table.committed_partitions()
    out: list[int] = []
    for key in partition_keys:
        if key in done:
            continue
        out.append(
            table.commit_append(
                make_df(key), summary={"partition_key": key}
            )
        )
    return out
