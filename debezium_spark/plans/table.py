"""LakeTable — bucketed, versioned, copy-on-write parquet table with atomic
offset-fenced commits.

This is the engine's sink. It implements the subset of Iceberg semantics the
CDC apply path needs — atomic snapshot commits, hash-bucket layout
(``bucket(N, key)``), snapshot-summary offset fence, schema evolution, and
commit-time lineage — over plain parquet + JSON manifests, because no Iceberg
runtime jar ships in this sandbox. On a real cluster the merge in
``plans.merge`` swaps to Iceberg ``MERGE INTO`` and this class becomes a thin
catalog wrapper; nothing else in the engine changes.

Why it is exactly-once (replaces the reference's Kafka breakpoint ledger +
read-back probes, ``debezium-core/.../connector/breakpoint/
BreakPointRecord.java:58-120`` and ``TableReplayTask.java:351-399``): data
files are written first, then a single JSON manifest naming them is published
with an atomic ``os.replace`` of the LATEST pointer. The manifest carries the
source offset fence ``(file, pos)`` *in the same commit* as the data, so a
crash between data write and manifest publish leaves only invisible orphan
files, and on resume any batch whose max offset <= fence is skipped — no
read-back probes needed.

Scale notes (100 TB / 10^10 events):
- Bucket count is the unit of rewrite: a merge rewrites only buckets touched
  by the batch (partition pruning on the CoW write), so merge cost is
  O(batch ∪ touched-bucket data), not O(table).
- Readers get bucket-pruned scans for key lookups; the bucket function is
  ``pmod(xxhash64(key...), n_buckets)`` computed in the JVM.
- Manifests are O(n_buckets) JSON — tiny; old versions expire like Iceberg
  snapshots (``expire_versions``).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

LATEST = "LATEST"


def bucket_expr(key_cols: list[str], n_buckets: int) -> "F.Column":
    """Iceberg-style bucket transform: pmod(hash(keys), N)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets))


class LakeTable:
    """A versioned CoW parquet table keyed by ``key_cols``."""

    def __init__(self, spark: SparkSession, root: str, key_cols: list[str], n_buckets: int = 16):
        self.spark = spark
        self.root = root.rstrip("/")
        self.key_cols = key_cols
        self.n_buckets = n_buckets
        self._mdir = os.path.join(self.root, "_manifests")

    # ---- manifest bookkeeping -------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self._mdir, LATEST))

    def create(self, schema: StructType) -> None:
        os.makedirs(self._mdir, exist_ok=True)
        os.makedirs(os.path.join(self.root, "data"), exist_ok=True)
        self._publish(
            {
                "version": 0,
                "schema": schema.json(),
                "buckets": {},
                "fence": None,
                "lineage": [],
                "parent": None,
            }
        )

    def manifest(self) -> dict:
        with open(os.path.join(self._mdir, LATEST)) as f:
            v = int(f.read().strip())
        with open(os.path.join(self._mdir, f"v{v:06d}.json")) as f:
            return json.load(f)

    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self.manifest()["schema"]))

    def fence(self) -> tuple[str, int] | None:
        fe = self.manifest()["fence"]
        return (fe["file"], fe["pos"]) if fe else None

    def _publish(self, man: dict) -> None:
        """Atomic commit: write the numbered manifest, then os.replace the
        LATEST pointer (atomic on POSIX). Single-writer protocol (the driver
        replay loop), like an Iceberg catalog pointer swap."""
        v = man["version"]
        path = os.path.join(self._mdir, f"v{v:06d}.json")
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, path)
        ptr_tmp = os.path.join(self._mdir, f".latest-{uuid.uuid4().hex}")
        with open(ptr_tmp, "w") as f:
            f.write(str(v))
        os.replace(ptr_tmp, os.path.join(self._mdir, LATEST))

    # ---- reads -----------------------------------------------------------

    def read(self, buckets: list[int] | None = None) -> DataFrame:
        """Current snapshot; optionally pruned to a bucket subset.

        Reads with the manifest schema so files written before an
        ALTER ADD COLUMN surface the new column as null (schema evolution,
        same contract as Iceberg's name-based projection)."""
        man = self.manifest()
        schema = StructType.fromJson(json.loads(man["schema"]))
        dirs: list[str] = []
        for b, paths in man["buckets"].items():
            if buckets is None or int(b) in buckets:
                dirs.extend(paths)
        if not dirs:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*dirs)

    # ---- commit (called by plans.merge) ----------------------------------

    def commit_buckets(
        self,
        new_bucket_dirs: dict[int, list[str]],
        touched: list[int],
        fence: tuple[str, int] | None,
        lineage: list[dict],
        schema: StructType | None = None,
    ) -> int:
        """Publish a new version: touched buckets point at the new dirs,
        untouched buckets carry over; fence + lineage ride the same commit."""
        man = self.manifest()
        buckets = dict(man["buckets"])
        for b in touched:
            buckets[str(b)] = new_bucket_dirs.get(b, [])
        new_man = {
            "version": man["version"] + 1,
            "schema": (schema or self.schema()).json(),
            "buckets": buckets,
            "fence": {"file": fence[0], "pos": fence[1]} if fence else man["fence"],
            "lineage": lineage,
            "parent": man["version"],
        }
        self._publish(new_man)
        return new_man["version"]

    def truncate(self, fence: tuple[str, int] | None = None, batch_id: str = "truncate") -> int:
        """TRUNCATE barrier (Envelope op 't', reference Envelope.java:498-505;
        sink-side replay analog in the fork's DML path): publish a version
        with every bucket empty. O(1) — no data files touched; old versions
        remain time-travelable until expired."""
        man = self.manifest()
        new_man = {
            "version": man["version"] + 1,
            "schema": man["schema"],
            "buckets": {},
            "fence": {"file": fence[0], "pos": fence[1]} if fence else man["fence"],
            "lineage": [
                {"batch": batch_id, "bucket": -1, "events": 1, "deletes": 0,
                 "upserts": 0, "truncate": True,
                 "fence_pos": fence[1] if fence else None}
            ],
            "parent": man["version"],
        }
        self._publish(new_man)
        return new_man["version"]

    def alter_add_columns(self, cols: list[tuple[str, str]]) -> None:
        """Schema evolution barrier — Iceberg ``ALTER TABLE ADD COLUMN``
        equivalent (SURVEY §2.8). Idempotent: re-adding an existing column is
        a no-op, so DDL replay after crash is safe."""
        man = self.manifest()
        schema = StructType.fromJson(json.loads(man["schema"]))
        existing = {f.name for f in schema.fields}
        changed = False
        for name, dtype in cols:
            if name not in existing:
                from pyspark.sql.types import _parse_datatype_string

                schema = schema.add(name, _parse_datatype_string(dtype), True)
                changed = True
        if not changed:
            return
        man2 = dict(man)
        man2["version"] = man["version"] + 1
        man2["schema"] = schema.json()
        man2["parent"] = man["version"]
        self._publish(man2)

    # ---- maintenance -----------------------------------------------------

    def lineage(self) -> list[dict]:
        """All lineage rows across versions (per-batch per-bucket metrics —
        the analog of the reference's progress committer,
        ``BaseSinkProcessInfo.java:103-158``)."""
        out = []
        for fn in sorted(os.listdir(self._mdir)):
            if fn.startswith("v") and fn.endswith(".json"):
                with open(os.path.join(self._mdir, fn)) as f:
                    out.extend(json.load(f).get("lineage", []))
        return out

    def expire_versions(self, keep_last: int = 2) -> None:
        """Drop old manifests and data dirs unreferenced by kept versions
        (Iceberg snapshot expiration; reference analog: breakpoint ledger
        compaction, README.md:332)."""
        names = sorted(
            fn for fn in os.listdir(self._mdir) if fn.startswith("v") and fn.endswith(".json")
        )
        if len(names) <= keep_last:
            return
        keep = names[-keep_last:]
        referenced: set[str] = set()
        for fn in keep:
            with open(os.path.join(self._mdir, fn)) as f:
                for paths in json.load(f)["buckets"].values():
                    referenced.update(paths)
        data_root = os.path.join(self.root, "data")
        for vdir in os.listdir(data_root):
            full = os.path.join(data_root, vdir)
            live = any(r.startswith(full) for r in referenced)
            if not live:
                shutil.rmtree(full, ignore_errors=True)
        for fn in names[:-keep_last]:
            os.remove(os.path.join(self._mdir, fn))
