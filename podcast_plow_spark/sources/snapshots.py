"""Snapshot store — the Iceberg-fallback persistence layer.

The sandbox has no Iceberg runtime jar / pyiceberg, so this module
implements exactly the two Iceberg properties the crawl engine relies
on (SURVEY.md §7 M0):

1. **Atomic epoch commits** — every epoch writes new table versions to
   a staging directory, then a single ``os.replace`` of the
   ``LATEST`` pointer file publishes the whole epoch. Readers either
   see the previous snapshot or the complete new one; a crash mid-epoch
   leaves the previous snapshot intact (tested in
   tests/test_crawl_engine.py::test_resume_after_kill).
2. **Resume from any snapshot** — ``load(epoch=k)`` reads the manifest
   for snapshot k; the engine continues from there.

The interface is deliberately the shape of an Iceberg catalog
(``write_table`` / ``read_table`` / ``commit`` / snapshot listing) so
a real ``spark.table("catalog.db.frontier")`` + ``MERGE INTO`` drops
in on a real cluster with no engine changes.

Layout::

    root/
      data/<table>/<epoch>/...parquet     (immutable once committed)
      manifests/manifest-<epoch>.json     {epoch, tables: {name: relpath}}
      LATEST                              -> manifest filename (atomic)
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["SnapshotStore"]


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        self._staged: dict[str, str] = {}

    # -- staging -------------------------------------------------------

    def write_table(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> str:
        """Stage a table version for the next commit. Data lands under a
        unique path immediately (parquet write is the expensive part);
        only the manifest pointer flip is deferred to commit()."""
        rel = os.path.join("data", name, uuid.uuid4().hex[:12])
        path = os.path.join(self.root, rel)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        self._staged[name] = rel
        return path

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

    def read_table(self, spark: SparkSession, name: str, epoch: int | None = None) -> DataFrame | None:
        manifest = self._latest_manifest() if epoch is None else self.manifest_for(epoch)
        if not manifest or name not in manifest["tables"]:
            return None
        return spark.read.parquet(os.path.join(self.root, manifest["tables"][name]))

    def expire_snapshots(self, keep_last: int = 3) -> None:
        """GC data versions unreachable from the last ``keep_last``
        manifests (the Iceberg expire_snapshots analog)."""
        mf_dir = os.path.join(self.root, "manifests")
        names = sorted(os.listdir(mf_dir))
        keep = names[-keep_last:]
        reachable: set[str] = set()
        for name in keep:
            with open(os.path.join(mf_dir, name)) as fh:
                reachable.update(json.load(fh)["tables"].values())
        data_dir = os.path.join(self.root, "data")
        for table in os.listdir(data_dir):
            for version in os.listdir(os.path.join(data_dir, table)):
                rel = os.path.join("data", table, version)
                if rel not in reachable:
                    shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
        for name in names[:-keep_last]:
            os.remove(os.path.join(mf_dir, name))
