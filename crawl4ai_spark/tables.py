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
import math
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    # Bin-packing target for compaction rewrites. The sandbox default is
    # sized for /dev/shm test state; a real deployment sets 128-512 MB
    # (Iceberg's write.target-file-size-bytes analog).
    COMPACT_TARGET_BYTES = 32 * 1024 * 1024
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

    def _commit(self, files: list[str], operation: str, schema: str | None = None,
                extra: dict | None = None) -> int:
        v = self.current_version() + 1
        manifest = {
            "snapshot_id": v,
            "parent_id": v - 1 if v > 1 else None,
            "operation": operation,
            "files": files,
            **(extra or {}),
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
        new = self._write_data(df)
        return self._commit(new, "overwrite", df.schema.json(),
                            {"delta_files": new})

    def append(self, df: DataFrame) -> int:
        new = self._write_data(df)
        return self._commit(self.files() + new, "append", df.schema.json(),
                            {"delta_files": new})

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

    def latest_delta_files(self) -> list[str]:
        """Files added by the latest commit — exact across maintenance: a
        compact commit rewrites the file list without adding rows, so its
        manifest carries the prior delta forward (``delta_files``) and the
        engine's per-round delta reads are unaffected by compaction."""
        v = self.current_version()
        if v == 0:
            return []
        m = self._manifest(v)
        if "delta_files" in m:  # every commit records its own delta
            return m["delta_files"]
        # legacy manifests (pre-delta_files): derive from the parent
        prev = set(self.files(v - 1)) if v > 1 else set()
        return [f for f in m["files"] if f not in prev]

    # -- maintenance -------------------------------------------------------
    def compact(self, spark: SparkSession, target_bytes: int | None = None,
                min_files: int = 8) -> int | None:
        """Bin-pack small data files (Iceberg ``rewrite_data_files``
        analog). An append-only engine table accrues one small file group
        per crawl round; every round then re-opens every footer on the
        seen-set/pending scans — on this sandbox file COUNT, not bytes,
        dominates small-state I/O (BENCH.md). Only files under
        ``target_bytes/2`` are rewritten (bin-packing, so a file is
        rewritten O(log n) times over the table's life, never the whole
        table per pass); content is byte-equal, and the committed
        manifest carries the pre-compact delta so ``latest_delta_files``
        (and crawl resume in delta-pending mode) stay exact. Returns the
        new snapshot id, or None when there is nothing worth packing."""
        files = self.files()
        target = self.COMPACT_TARGET_BYTES if target_bytes is None else target_bytes
        sizes = {f: os.path.getsize(f) for f in files}
        small = [f for f in files if sizes[f] < target / 2]
        if len(small) < max(2, min_files):
            return None
        delta = self.latest_delta_files()
        big = [f for f in files if f not in set(small)]
        packed_parts = max(1, math.ceil(sum(sizes[f] for f in small) / target))
        new = self._write_data(self.read_files(spark, small).coalesce(packed_parts))
        return self._commit(big + new, "compact", self.schema_json(),
                            {"delta_files": delta, "rewrote": len(small)})

    def expire_snapshots(self, keep_from: int) -> dict:
        """Delete manifests older than snapshot ``keep_from`` and the data
        files only they reference (Iceberg ``expire_snapshots`` analog).
        The caller must pass a version no newer than the last durable
        checkpoint for this table — resume rolls back to the checkpointed
        version, and rolling back past an expired snapshot is an error by
        design (the files are gone)."""
        cur = self.current_version()
        keep_from = max(1, min(keep_from, cur))
        referenced: set[str] = set()
        for v in range(keep_from, cur + 1):
            p = os.path.join(self.meta, f"v{v}.json")
            if not os.path.exists(p):
                continue
            m = self._manifest(v)
            referenced.update(m["files"])
            referenced.update(m.get("delta_files", []))
        removed_files, removed_manifests = 0, 0
        for v in range(1, keep_from):
            p = os.path.join(self.meta, f"v{v}.json")
            if not os.path.exists(p):
                continue
            for f in self._manifest(v)["files"]:
                if f not in referenced and os.path.exists(f):
                    os.remove(f)
                    removed_files += 1
            os.remove(p)
            removed_manifests += 1
        for d in os.listdir(self.data):
            full = os.path.join(self.data, d)
            if os.path.isdir(full) and not os.listdir(full):
                os.rmdir(full)
        return {"removed_files": removed_files,
                "removed_manifests": removed_manifests}

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

    def rounds(self) -> list[int]:
        """Rounds with a durable checkpoint, ascending — the time-travel
        axis (Iceberg's snapshot log analog at the multi-table level)."""
        return sorted(
            int(f[3:-5]) for f in os.listdir(self.dir)
            if f.startswith("ckp") and f.endswith(".json")
        )

    def at_round(self, round_no: int) -> dict | None:
        """The manifest pinning every table's snapshot version as of a
        given round, or None if that round never checkpointed."""
        p = os.path.join(self.dir, f"ckp{round_no}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def latest(self) -> dict | None:
        rounds = self.rounds()
        return None if not rounds else self.at_round(rounds[-1])

    def commit(self, round_no: int, versions: dict[str, int], extra: dict | None = None) -> None:
        doc = {"round": round_no, "versions": versions, **(extra or {})}
        tmp = os.path.join(self.dir, f".ckp{round_no}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.rename(tmp, os.path.join(self.dir, f"ckp{round_no}.json"))
