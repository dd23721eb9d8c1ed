"""CK1 — Iceberg-shaped snapshot tables (SURVEY.md §7.3).

No Iceberg runtime jar exists in this sandbox, so this module provides an
Iceberg-*shaped* table: immutable parquet data files under ``<path>/data``,
one JSON manifest per committed snapshot under ``<path>/snapshots/v{N}.json``
(file list + row counts + engine metadata + parent pointer), and an
atomically-replaced ``<path>/CURRENT`` pointer.  This gives the properties
the north rule exercises — append-only snapshots, versioned time-travel
reads for exact resume, per-snapshot lineage/metadata — with the same
``append``/``overwrite``/``read(version)`` surface an Iceberg catalog
would provide, so a real Iceberg catalog can replace it by config when a
jar is present.

Commit protocol: data files are written first, the manifest next, and the
CURRENT pointer last via ``os.replace`` (atomic on POSIX).  A crash
between steps leaves orphan data files but never a torn table.  On a real
cluster the same protocol works against any filesystem with atomic rename
(HDFS) or conditional put (S3).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str, schema: StructType | None = None):
        self.spark = spark
        self.path = path
        self._schema = schema
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)

    # -- manifest plumbing ---------------------------------------------------

    def _current_path(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def current_version(self) -> int | None:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def manifest(self, version: int | None = None) -> dict | None:
        v = self.current_version() if version is None else version
        if v is None:
            return None
        with open(os.path.join(self.path, "snapshots", f"v{v}.json")) as f:
            return json.load(f)

    def meta(self, version: int | None = None) -> dict:
        m = self.manifest(version)
        return {} if m is None else m.get("meta", {})

    def row_count(self, version: int | None = None) -> int:
        m = self.manifest(version)
        return 0 if m is None else int(m.get("rows", 0))

    def _commit(
        self,
        files: list[str],
        rows: int,
        meta: dict,
        parent: int | None,
        added: list[str] | None = None,
    ) -> int:
        v = 0 if parent is None else parent + 1
        manifest = {
            "version": v,
            "parent": parent,
            "files": files,
            "added": added if added is not None else files,
            "rows": rows,
            "meta": meta,
            "schema": json.loads(self._schema.json()) if self._schema else None,
        }
        mpath = os.path.join(self.path, "snapshots", f"v{v}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        tmp = self._current_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._current_path())
        return v

    # -- writes --------------------------------------------------------------

    def _write_batch(self, df: DataFrame) -> tuple[list[str], int]:
        batch_dir = os.path.join(self.path, "data", f"batch-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(batch_dir)
        files = sorted(
            os.path.join(batch_dir, f)
            for f in os.listdir(batch_dir)
            if f.endswith(".parquet")
        )
        if self._schema is None:
            self._schema = df.schema
        rows = self._count_parquet_rows(files)
        return files, rows

    def _count_parquet_rows(self, files: list[str]) -> int:
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    def append(self, df: DataFrame, meta: dict | None = None) -> int:
        """Append-only commit: new files + parent's files (O(new) IO)."""
        parent = self.current_version()
        prev = self.manifest(parent) if parent is not None else None
        files, rows = self._write_batch(df)
        all_files = (prev["files"] if prev else []) + files
        all_rows = (prev["rows"] if prev else 0) + rows
        m = dict(prev["meta"] if prev else {})
        m.update(meta or {})
        return self._commit(all_files, all_rows, m, parent, added=files)

    def overwrite(self, df: DataFrame, meta: dict | None = None) -> int:
        parent = self.current_version()
        files, rows = self._write_batch(df)
        return self._commit(files, rows, meta or {}, parent)

    def rollback(self, version: int) -> int:
        """Point CURRENT at ``version``'s state via a new commit (time
        travel for exact resume after a torn engine round)."""
        parent = self.current_version()
        if parent == version:
            return parent
        m = self.manifest(version)
        if m is None:
            raise ValueError(f"no snapshot v{version} in {self.path}")
        return self._commit(m["files"], m["rows"], m.get("meta", {}), parent, added=[])

    def commit_meta(self, meta: dict) -> int:
        """New snapshot with unchanged data, updated metadata."""
        parent = self.current_version()
        prev = self.manifest(parent)
        files = prev["files"] if prev else []
        rows = prev["rows"] if prev else 0
        m = dict(prev["meta"] if prev else {})
        m.update(meta)
        return self._commit(files, rows, m, parent)

    # -- reads ---------------------------------------------------------------

    def schema(self) -> StructType | None:
        if self._schema is not None:
            return self._schema
        m = self.manifest()
        if m and m.get("schema"):
            self._schema = StructType.fromJson(m["schema"])
        return self._schema

    def read(self, version: int | None = None) -> DataFrame:
        m = self.manifest(version)
        if m is None or not m["files"]:
            schema = self.schema()
            if schema is None and m is not None and m.get("schema"):
                schema = StructType.fromJson(m["schema"])
            if schema is None:
                raise ValueError(f"empty table with unknown schema: {self.path}")
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*m["files"])

    def read_delta(self, version: int) -> DataFrame:
        """Only the files added by commit ``version`` (one round's batch)."""
        m = self.manifest(version)
        if m is None:
            raise ValueError(f"no snapshot v{version} in {self.path}")
        added = m.get("added", m["files"])
        if not added:
            return self.spark.createDataFrame([], self.schema())
        return self.spark.read.parquet(*added)
