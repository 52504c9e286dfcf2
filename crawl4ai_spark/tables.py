"""Iceberg-style snapshot tables over parquet (engine state store).

No Iceberg runtime jar exists in this sandbox, so this is a from-scratch
metadata layer with the same *shape* a real Iceberg catalog provides, so
swapping in `spark.table("catalog.db.frontier")` later is a drop-in:

    <root>/<table>/
        data/<uuid>/part-*.parquet     (immutable — never rewritten)
        metadata/v<N>.json             (snapshot manifest: file list,
                                        parent snapshot, summary)
        metadata/version-hint.text     (current version pointer)

Commit protocol (atomicity):
 1. Spark writes data files into a fresh uuid-named directory.
 2. Manifest v<N>.json is written to a temp name then os.rename()d —
    rename is atomic on POSIX; on HDFS/S3 a real deployment uses the
    Iceberg catalog's atomic swap instead.
 3. version-hint.text is temp-written + renamed.

A reader always resolves version-hint → manifest → exact file list, so a
crashed writer can never expose a partial snapshot: a killed run resumes
from the last committed snapshot exactly (north rule). Multi-table
checkpoints (frontier + url_seen + pages + metrics per round) are made
atomic by the CHECKPOINT manifest one level up (see ``Checkpoint``).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.meta = os.path.join(self.dir, "metadata")
        self.data = os.path.join(self.dir, "data")
        os.makedirs(self.meta, exist_ok=True)
        os.makedirs(self.data, exist_ok=True)

    # -- metadata ----------------------------------------------------------
    def _hint_path(self) -> str:
        return os.path.join(self.meta, "version-hint.text")

    def current_version(self) -> int:
        try:
            with open(self._hint_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.meta, f"v{version}.json")) as f:
            return json.load(f)

    def files(self, version: int | None = None) -> list[str]:
        v = self.current_version() if version is None else v0(version)
        if v == 0:
            return []
        return self._manifest(v)["files"]

    def schema_json(self, version: int | None = None) -> str | None:
        """Pinned writer schema (Iceberg manifests carry the same): lets
        reads skip parquet footer inference — measurable per-round savings
        when engine tables are re-read every crawl round."""
        v = self.current_version() if version is None else v0(version)
        if v == 0:
            return None
        return self._manifest(v).get("schema")

    # -- commit ------------------------------------------------------------
    def _write_data(self, df: DataFrame) -> list[str]:
        d = os.path.join(self.data, uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(d)
        return sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(".")
        )

    def _commit(self, files: list[str], operation: str, schema: str | None = None) -> int:
        v = self.current_version() + 1
        manifest = {
            "snapshot_id": v,
            "parent_id": v - 1 if v > 1 else None,
            "operation": operation,
            "files": files,
        }
        if schema is None and v > 1:  # appends inherit the table schema
            schema = self._manifest(v - 1).get("schema")
        if schema is not None:
            manifest["schema"] = schema
        tmp = os.path.join(self.meta, f".v{v}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, os.path.join(self.meta, f"v{v}.json"))
        tmp_hint = self._hint_path() + ".tmp"
        with open(tmp_hint, "w") as f:
            f.write(str(v))
        os.rename(tmp_hint, self._hint_path())
        return v

    def overwrite(self, df: DataFrame) -> int:
        return self._commit(self._write_data(df), "overwrite", df.schema.json())

    def append(self, df: DataFrame) -> int:
        return self._commit(self.files() + self._write_data(df), "append", df.schema.json())

    # -- read --------------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        files = self.files(version)
        if not files:
            return None
        return self.read_files(spark, files, version)

    def read_files(self, spark: SparkSession, files: list[str],
                   version: int | None = None) -> DataFrame:
        """Read an explicit file subset (e.g. one commit's delta) with the
        manifest-pinned schema — no footer inference."""
        sj = self.schema_json(version)
        if sj is not None:
            from pyspark.sql.types import StructType

            return spark.read.schema(StructType.fromJson(json.loads(sj))).parquet(*files)
        return spark.read.parquet(*files)

    def exists(self) -> bool:
        return self.current_version() > 0

    def rollback(self, version: int) -> None:
        """Point the table back at an older snapshot (data files are
        immutable and never deleted, so this is just a hint rewrite).
        Used on resume: tables committed after the last durable round
        checkpoint are rolled back, making the round replay idempotent."""
        if version < 0 or version > self.current_version():
            raise ValueError(f"cannot roll back to v{version}")
        tmp = self._hint_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.rename(tmp, self._hint_path())


def v0(v: int) -> int:
    if v < 0:
        raise ValueError("negative snapshot version")
    return v


class Checkpoint:
    """Atomic multi-table checkpoint: one manifest pinning the snapshot
    version of every engine table for a crawl round. The round is durable
    iff its checkpoint file exists — partial table commits without a
    checkpoint are invisible to resume (they are re-done idempotently)."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "checkpoints")
        os.makedirs(self.dir, exist_ok=True)

    def latest(self) -> dict | None:
        rounds = sorted(
            int(f[3:-5]) for f in os.listdir(self.dir)
            if f.startswith("ckp") and f.endswith(".json")
        )
        if not rounds:
            return None
        with open(os.path.join(self.dir, f"ckp{rounds[-1]}.json")) as f:
            return json.load(f)

    def commit(self, round_no: int, versions: dict[str, int], extra: dict | None = None) -> None:
        doc = {"round": round_no, "versions": versions, **(extra or {})}
        tmp = os.path.join(self.dir, f".ckp{round_no}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.rename(tmp, os.path.join(self.dir, f"ckp{round_no}.json"))
