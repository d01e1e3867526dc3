"""Snapshot store — the Iceberg-fallback persistence layer.

The sandbox has no Iceberg runtime jar / pyiceberg, so this module
implements the Iceberg properties the crawl engine relies on
(SURVEY.md §7 M0, SCALE_DESIGN.md):

1. **Atomic epoch commits** — every epoch writes new data files to
   unique staging paths, then a single ``os.replace`` of the
   ``LATEST`` pointer file publishes the whole epoch. Readers either
   see the previous snapshot or the complete new one; a crash mid-epoch
   leaves the previous snapshot intact (tested in
   tests/test_crawl_engine.py::test_resume_after_kill).
2. **Resume from any snapshot** — ``load(epoch=k)`` reads the manifest
   for snapshot k; the engine continues from there.
3. **Bucketed tables + bucket-pruned MERGE** — the Iceberg
   ``PARTITIONED BY (bucket(N, host))`` + ``MERGE INTO`` analog: a
   bucketed table's manifest maps bucket-id → data path, and
   :meth:`merge_buckets` rewrites ONLY the buckets an epoch touched;
   untouched buckets are carried forward as manifest pointers to their
   existing (immutable) files. At the 10^10-frontier design point this
   is the difference between rewriting ~3 TB per epoch and rewriting
   ~(batch hosts / total hosts) of it.
4. **Append tables** — the Iceberg fast-append analog for the
   append-only side tables (crawl_log, lineage, fetched_images): each
   epoch adds one new data file; the manifest accumulates the part
   list. No read-modify-write of history, ever.

The interface is deliberately the shape of an Iceberg catalog
(``write_table`` / ``read_table`` / ``commit`` / snapshot listing) so
a real ``spark.table("catalog.db.frontier")`` + ``MERGE INTO`` /
``table.newFastAppend()`` drops in on a real cluster with no engine
changes.

Manifest layout::

    root/
      data/<table>/<version>/...            (immutable once committed)
      manifests/manifest-<epoch>.json
      LATEST                                -> manifest filename (atomic)

Manifest table entries (three kinds)::

    "plain_table":  "data/t/abc123"
    "frontier":     {"kind": "bucketed", "bucket_col": "host_hash",
                     "buckets": {"0": "data/frontier/v1/__bucket=0",
                                 "1": "data/frontier/v7/__bucket=1", ...}}
    "crawl_log":    {"kind": "append", "parts": ["data/crawl_log/v1", ...]}

Note bucket 0 and bucket 1 above point into *different versions* —
that is the bucket-pruned merge at work.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["SnapshotStore"]

_BUCKET_DIR_COL = "__bucket"


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        self._staged: dict[str, object] = {}

    # -- staging -------------------------------------------------------

    def _new_version_rel(self, name: str) -> str:
        return os.path.join("data", name, uuid.uuid4().hex[:12])

    def write_table(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> str:
        """Stage a FULL table version for the next commit. Data lands
        under a unique path immediately (the parquet write is the
        expensive part); only the manifest pointer flip is deferred to
        commit()."""
        rel = self._new_version_rel(name)
        path = os.path.join(self.root, rel)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        self._staged[name] = rel
        return path

    def write_bucketed(self, name: str, df: DataFrame, bucket_col: str = "host_hash") -> None:
        """Stage a bucketed table: one data directory per distinct
        ``bucket_col`` value, each individually addressable by the
        manifest (→ :meth:`merge_buckets` can later swap single
        buckets). ``bucket_col`` stays IN the data files (the directory
        key is a copy), so reading any subset of buckets yields the
        full schema."""
        rel = self._new_version_rel(name)
        path = os.path.join(self.root, rel)
        df.withColumn(_BUCKET_DIR_COL, F.col(bucket_col)).write.mode("overwrite").partitionBy(
            _BUCKET_DIR_COL
        ).parquet(path)
        buckets = self._scan_bucket_dirs(rel)
        self._staged[name] = {"kind": "bucketed", "bucket_col": bucket_col, "buckets": buckets}

    def merge_buckets(self, name: str, touched_df: DataFrame, bucket_col: str | None = None) -> list[int]:
        """Bucket-pruned MERGE: ``touched_df`` is the complete new
        content of every bucket it contains rows for. Those buckets'
        manifest pointers move to the freshly written files; all other
        buckets carry forward untouched (pointer copy, zero I/O).

        Returns the list of bucket ids rewritten. This is the Iceberg
        ``MERGE INTO`` analog under the copy-on-write strategy with
        partition-granularity pruning."""
        entry = self._current_entry(name)
        assert isinstance(entry, dict) and entry.get("kind") == "bucketed", f"{name} is not bucketed"
        bucket_col = bucket_col or entry["bucket_col"]
        rel = self._new_version_rel(name)
        path = os.path.join(self.root, rel)
        touched_df.withColumn(_BUCKET_DIR_COL, F.col(bucket_col)).write.mode("overwrite").partitionBy(
            _BUCKET_DIR_COL
        ).parquet(path)
        new_buckets = self._scan_bucket_dirs(rel)
        merged = dict(entry["buckets"])
        merged.update(new_buckets)
        self._staged[name] = {"kind": "bucketed", "bucket_col": bucket_col, "buckets": merged}
        return sorted(int(k) for k in new_buckets)

    def append_table(self, name: str, delta: DataFrame) -> None:
        """Stage an append: one new data file list entry; history is
        never re-read or re-written (Iceberg fast-append analog)."""
        rel = self._new_version_rel(name)
        delta.write.mode("overwrite").parquet(os.path.join(self.root, rel))
        entry = self._current_entry(name)
        parts = list(entry["parts"]) if isinstance(entry, dict) and entry.get("kind") == "append" else []
        parts.append(rel)
        self._staged[name] = {"kind": "append", "parts": parts}

    def _scan_bucket_dirs(self, rel: str) -> dict[str, str]:
        path = os.path.join(self.root, rel)
        out: dict[str, str] = {}
        for d in os.listdir(path):
            if d.startswith(f"{_BUCKET_DIR_COL}="):
                out[d.split("=", 1)[1]] = os.path.join(rel, d)
        return out

    def _current_entry(self, name: str):
        if name in self._staged:
            return self._staged[name]
        manifest = self._latest_manifest()
        if manifest and name in manifest["tables"]:
            return manifest["tables"][name]
        return None

    def carry_forward(self, name: str) -> None:
        """Stage the current committed version of ``name`` unchanged."""
        manifest = self._latest_manifest()
        if manifest and name in manifest["tables"]:
            self._staged[name] = manifest["tables"][name]

    # -- commit / read -------------------------------------------------

    def commit(self, epoch: int, metadata: dict | None = None) -> None:
        manifest = self._latest_manifest()
        tables = dict(manifest["tables"]) if manifest else {}
        tables.update(self._staged)
        new_manifest = {"epoch": epoch, "tables": tables, "metadata": metadata or {}}
        mf_name = f"manifest-{epoch:08d}.json"
        mf_path = os.path.join(self.root, "manifests", mf_name)
        tmp = mf_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(new_manifest, fh)
        os.replace(tmp, mf_path)
        # the atomic publish: readers only ever follow LATEST
        latest_tmp = os.path.join(self.root, "LATEST.tmp")
        with open(latest_tmp, "w") as fh:
            fh.write(mf_name)
        os.replace(latest_tmp, os.path.join(self.root, "LATEST"))
        self._staged = {}

    def _latest_manifest(self) -> dict | None:
        latest = os.path.join(self.root, "LATEST")
        if not os.path.exists(latest):
            return None
        with open(latest) as fh:
            mf_name = fh.read().strip()
        with open(os.path.join(self.root, "manifests", mf_name)) as fh:
            return json.load(fh)

    def manifest_for(self, epoch: int) -> dict | None:
        path = os.path.join(self.root, "manifests", f"manifest-{epoch:08d}.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    @property
    def latest_epoch(self) -> int | None:
        m = self._latest_manifest()
        return None if m is None else m["epoch"]

    def latest_metadata(self) -> dict:
        m = self._latest_manifest()
        return {} if m is None else m.get("metadata", {})

    def table_entry(self, name: str, epoch: int | None = None):
        manifest = self._latest_manifest() if epoch is None else self.manifest_for(epoch)
        if not manifest or name not in manifest["tables"]:
            return None
        return manifest["tables"][name]

    def _entry_paths(self, entry, bucket_ids: list[int] | None = None) -> list[str]:
        if isinstance(entry, str):
            return [os.path.join(self.root, entry)]
        if entry.get("kind") == "bucketed":
            buckets = entry["buckets"]
            keys = [str(b) for b in bucket_ids] if bucket_ids is not None else sorted(buckets)
            return [os.path.join(self.root, buckets[k]) for k in keys if k in buckets]
        if entry.get("kind") == "append":
            return [os.path.join(self.root, p) for p in entry["parts"]]
        raise ValueError(f"unknown table entry {entry!r}")

    def read_table(
        self,
        spark: SparkSession,
        name: str,
        epoch: int | None = None,
        bucket_ids: list[int] | None = None,
    ) -> DataFrame | None:
        """Read a table (any kind) at the latest — or a pinned — epoch.
        For bucketed tables ``bucket_ids`` prunes the read to just
        those buckets' files (manifest-level partition pruning: the
        other buckets' files are never opened)."""
        entry = self.table_entry(name, epoch)
        if entry is None:
            return None
        paths = self._entry_paths(entry, bucket_ids)
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def expire_snapshots(self, keep_last: int = 3) -> None:
        """GC data versions unreachable from the last ``keep_last``
        manifests (the Iceberg expire_snapshots analog). Reachability
        is at version-directory granularity: a version dir survives if
        any manifest references it or any bucket inside it."""
        mf_dir = os.path.join(self.root, "manifests")
        names = sorted(os.listdir(mf_dir))
        keep = names[-keep_last:]
        reachable: set[str] = set()

        def add_rel(rel: str) -> None:
            parts = rel.split(os.sep)
            reachable.add(os.path.join(*parts[:3]))  # data/<table>/<version>

        for name in keep:
            with open(os.path.join(mf_dir, name)) as fh:
                for entry in json.load(fh)["tables"].values():
                    if isinstance(entry, str):
                        add_rel(entry)
                    elif entry.get("kind") == "bucketed":
                        for rel in entry["buckets"].values():
                            add_rel(rel)
                    elif entry.get("kind") == "append":
                        for rel in entry["parts"]:
                            add_rel(rel)
        data_dir = os.path.join(self.root, "data")
        for table in os.listdir(data_dir):
            for version in os.listdir(os.path.join(data_dir, table)):
                rel = os.path.join("data", table, version)
                if rel not in reachable:
                    shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
        for name in names[:-keep_last]:
            os.remove(os.path.join(mf_dir, name))
