"""CdcEngine — the micro-batch replay loop.

Plays the role of the reference's coordinator + embedded engine run loop
(``pipeline/ChangeEventSourceCoordinator.java:96-165`` snapshot→stream
handoff; ``debezium-embedded/.../EmbeddedEngine.java:770-860`` poll →
transform → handle → offset-commit loop) and of the fork's sink replay task
(``sink/replay/table/TableReplayTask.java``), collapsed into one driver loop:

    for each ordered batch beyond the fence:
        SMT chain (Catalyst projections)
        DDL barrier segmentation (op='l')
        PK-change split  →  last-writer-wins dedupe  →  MERGE commit
        (fence + per-bucket lineage ride the same commit)

Exactly-once: the fence check in ``merge_changes`` skips any batch whose max
offset <= the committed fence, and the commit is atomic, so re-running any
prefix after a crash is a no-op (FIXTURES.md F4 idempotency).
"""

from __future__ import annotations

import json
import os
import time as _time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from debezium_spark.operators.apply import compute_changes, split_pk_changes
from debezium_spark.operators.quarantine import _reason_col, split_valid, write_quarantine
from debezium_spark.operators.schema_evolution import DDL_OP, apply_ddl, parse_ddl
from debezium_spark.schema import CONTROL_OPS, offset_key
from debezium_spark.schema import OP_PATH as PATH_OP
from debezium_spark.schema import OP_TRUNCATE as TRUNCATE_OP
from debezium_spark.schema import OP_TRUNCATE_CASCADE as TRUNCATE_CASCADE_OP

#: batch-splitting barrier rows: DDL + truncate (+ the fork's cascade form)
#: + PATH slice pointers (a snapshot slice loads AT its stream position —
#: events after it overwrite, events before merged under pre-slice state)
BARRIER_OPS = [DDL_OP, TRUNCATE_OP, TRUNCATE_CASCADE_OP, PATH_OP]
from debezium_spark.plans.merge import merge_changes
from debezium_spark.plans.table import LakeTable
from debezium_spark.schema import REPO_KEY_COLS, REPO_PAYLOAD_SCHEMA
from debezium_spark.sources.batches import list_batches, read_batch

Smt = Callable[[DataFrame], DataFrame]


def split_open_tail_tx(
    env: DataFrame, probe: dict | None = None
) -> tuple[DataFrame | None, DataFrame | None, int | None]:
    """Transaction-aligned batch segmentation (reference: whole transactions
    are assembled before apply, ``sink/replay/transaction/
    TransactionReplayTask.java``; the fork's binlog patch switches parse
    queues only on XID boundaries, ``mysql-binlog-connector-java-0.25.4.
    patch:230-330``).

    In an ordered change log, transactions are contiguous pos runs. The only
    transaction a batch can leave OPEN is the one owning its max-pos row —
    every earlier transaction is proven closed by the existence of a later
    event. If that tail transaction carries metadata (``transaction.id``
    non-null), its run is split off and deferred to the next batch so one
    transaction never commits across two fences; null-tx rows (autocommit)
    are closed by definition.

    Returns (closed, deferred, boundary_pos): ``closed`` = rows with pos <=
    boundary (None if the whole batch is one open transaction), ``deferred``
    = the open tail run (None if nothing defers).

    ``probe`` (optional) carries the answers precomputed by the caller's
    fused per-batch aggregation (``{"p", "tt", "boundary"}`` — see
    ``CdcEngine.replay``), making this a zero-job pure plan transform; when
    absent, two narrow driver aggregations compute them here."""
    if probe is not None:
        p, tail_tx, boundary = probe["p"], probe["tt"], probe["boundary"]
    else:
        agg = env.select(
            F.max("source.pos").alias("p"),
            F.max_by(F.col("transaction.id"), F.col("source.pos")).alias("tt"),
        ).first()
        p, tail_tx = agg["p"], agg["tt"]
        boundary = (
            env.filter(~F.col("transaction.id").eqNullSafe(F.lit(tail_tx)))
            .select(F.max("source.pos"))
            .first()[0]
            if p is not None and tail_tx is not None
            else None
        )
    if p is None or tail_tx is None:
        return env, None, None
    if boundary is None:
        return None, env, None  # entire batch is one still-open transaction
    # null-pos poison records ride with the CLOSED part — a bare pos<=b
    # filter is NULL for them and they would vanish before ever reaching
    # quarantine ('one bad row never wedges OR vanishes')
    closed = env.filter(
        (F.col("source.pos") <= boundary) | F.col("source.pos").isNull()
    )
    deferred = env.filter(F.col("source.pos") > boundary)
    return closed, deferred, boundary


def fused_tail_probe(
    env: DataFrame, flags: dict | None = None, with_file: bool = False
) -> dict:
    """ONE driver job answering the tail-transaction questions for a batch:
    ``{"p": max pos, "tt": tail tx id, "pmin": tail run start, "ng": number
    of tx groups holding real offsets, "ngrp": total tx groups (>0 ⇔ the
    batch has rows, even if every offset is null), "n": total row count
    (feeds the progress committer's extract/skip counters)}``. Per-tx partial
    aggregate (tiny shuffle: one row per transaction) + global fold — THE
    per-batch probe, shared by ``CdcEngine.replay`` and
    ``MultiTableEngine``.

    ``flags``: optional named boolean columns (e.g. barrier presence,
    malformed-row presence) folded into the SAME job — each yields a global
    max under its name plus the tail group's own value under
    ``tail_<name>`` (the deferred run's flags feed the carry meta).
    ``with_file=True`` adds the global max source file as ``f``."""
    flags = flags or {}
    aggs = [
        F.max("source.pos").alias("p"),
        F.min("source.pos").alias("pmin"),
        F.count(F.lit(1)).alias("nrows"),
    ]
    if with_file:
        aggs.append(F.max("source.file").alias("f"))
    for name, c in flags.items():
        aggs.append(F.max(c.cast("int")).alias(name))
    per_tx = env.groupBy(F.col("transaction.id").alias("_tx")).agg(*aggs)

    tail_struct = F.struct(
        F.col("_tx").alias("tx"), F.col("pmin").alias("pmin"),
        F.col("nrows").alias("nrows"),
        *[F.col(n).alias(n) for n in flags],
    )
    sel = [
        F.max("p").alias("p"),
        F.max_by(tail_struct, F.col("p")).alias("tail"),
        F.count(F.when(F.col("p").isNotNull(), 1)).alias("ng"),
        F.count(F.lit(1)).alias("ngrp"),
        F.sum("nrows").alias("n"),
    ]
    if with_file:
        sel.append(F.max("f").alias("f"))
    for name in flags:
        sel.append(F.max(name).alias(name))
    row = per_tx.select(*sel).first()
    tail = row["tail"]
    out = {
        "p": row["p"],
        "tt": tail["tx"] if tail is not None else None,
        "pmin": tail["pmin"] if tail is not None else None,
        "ng": row["ng"],
        "ngrp": row["ngrp"],
        "n": row["n"] or 0,
        # the tail tx group's own row count — the progress committer's
        # deferred-row figure when the tail is carried to the next batch
        "tail_n": (tail["nrows"] or 0) if tail is not None else 0,
    }
    if with_file:
        out["f"] = row["f"]
    for name in flags:
        out[name] = row[name]
        out[f"tail_{name}"] = tail[name] if tail is not None else None
    return out


def derive_tx_boundary(probe: dict, carry_meta: dict | None, had_carry: bool) -> int | None:
    """Tail-run boundary from a batch's ``fused_tail_probe`` facts + the
    carried transaction's meta (transactions are contiguous pos runs and
    every carry pos < every batch pos — see ``CdcEngine.replay``):
    other positioned groups in the batch → the tail run starts at its own
    pmin; batch all-one-tx over a DIFFERENT carried tx → the new tx proves
    the carried one closed at its max pos; same tx (or no carry) → still
    open end-to-end (None)."""
    if probe["tt"] is None:
        return None
    if probe["ng"] > 1:
        return probe["pmin"] - 1
    if had_carry and carry_meta is not None and carry_meta["tx"] != probe["tt"]:
        return carry_meta["p"]
    return None


def _carry_versions(root: str) -> list[tuple[int, str]]:
    base = os.path.join(root, "_tx_carry")
    out = []
    if os.path.isdir(base):
        for n in os.listdir(base):
            if n.startswith("v"):
                try:
                    out.append((int(n[1:]), os.path.join(base, n)))
                except ValueError:
                    pass
    return sorted(out)


def persist_tx_carry(
    spark: SparkSession,
    carry: DataFrame | None,
    root: str,
    meta: dict | None = None,
) -> DataFrame | None:
    """Materialize the open-tail-transaction carry under
    ``<root>/_tx_carry/vN``.

    Two jobs in one: (1) lineage truncation — without it each batch nests
    another union+filter over every earlier batch's source (O(N) plan depth,
    O(N²) cumulative re-reads on a long stream); (2) crash recovery for
    callers whose source will NOT redeliver the batch (a streaming
    checkpoint advances past the epoch even though the carry rows were never
    committed — batch-file replay can re-split deterministically, streaming
    cannot).

    Versioned: the NEW carry writes to vN+1, then older versions delete —
    never overwrite-in-place, because (a) the new carry's own lineage reads
    vN, and (b) the caller persists AFTER its commits, so a crash mid-epoch
    leaves vN intact for the redelivered epoch to resume from (the correct
    recovery point is the PRE-epoch carry). ``None`` clears everything.
    Returns the re-read (flat-scan) DataFrame.

    ``meta`` (optional): the carry's fused-probe facts ``{"tx", "p", "nd",
    "nb"}`` — its transaction id, max pos, and barrier/bad flags — written
    as ``_carry_meta.json`` inside the version dir (underscore-prefixed
    files are invisible to the parquet reader). They let the NEXT batch's
    split stay a zero-job plan transform (see ``CdcEngine.replay``); a
    carry without meta is handled by the probing fallback."""
    import json as _json
    import shutil

    versions = _carry_versions(root)
    if carry is None:
        for _, p in versions:
            shutil.rmtree(p, ignore_errors=True)
        return None
    nxt = (versions[-1][0] + 1) if versions else 1
    d = os.path.join(root, "_tx_carry", f"v{nxt}")
    carry.write.mode("overwrite").parquet(d)  # reads vN while writing vN+1
    if meta is not None:
        with open(os.path.join(d, "_carry_meta.json"), "w") as f:
            _json.dump(meta, f)
    for _, p in versions:
        shutil.rmtree(p, ignore_errors=True)
    return spark.read.parquet(d)


def load_tx_carry(spark: SparkSession, root: str) -> DataFrame | None:
    """Reload the latest persisted open-tail-transaction carry (restart)."""
    versions = _carry_versions(root)
    if versions:
        return spark.read.parquet(versions[-1][1])
    return None


def load_tx_carry_meta(root: str) -> dict | None:
    """The persisted carry's fused-probe facts (see ``persist_tx_carry``),
    or None for a missing/legacy carry."""
    import json as _json

    versions = _carry_versions(root)
    if not versions:
        return None
    path = os.path.join(versions[-1][1], "_carry_meta.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return _json.load(f)


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        smt_chain: list[Smt] | None = None,
        salt_factor: int = 4,
        compact_depth: int = 8,
        quarantine: bool = True,
        tombstones_on_delete: bool = False,
        history_compact_threshold: int = 256,
        expire_keep: int | None = None,
        committer=None,
    ) -> None:
        """``compact_depth``: in MoR mode, fold deltas into the base once any
        bucket accumulates this many delta files (read cost grows with delta
        depth; compaction restores it). 0 disables auto-compaction.

        ``quarantine``: divert malformed rows (unknown op, null key/offset)
        to the table's quarantine area instead of merging garbage or
        failing the batch — the reference's fail-SQL ledger
        (TableReplayTask.java:61,98,612). The fence still advances past
        quarantined offsets. False = strict mode: a malformed row FAILS
        the batch with a ValueError naming the validity reason (Kafka
        Connect ``errors.tolerance=none`` semantics — letting the row
        continue would silently drop it in the three-valued segment
        filters, not merge it).

        ``tombstones_on_delete``: emit the wire-format tombstone between the
        DELETE and CREATE of a PK-change split (tombstones.on.delete config;
        RecordMakers.java:282-312). Tombstones are dropped before the merge
        dedupe, so the final table state is identical either way — the flag
        exists for wire-format consumers tapping the split stream.

        ``committer``: optional ``streaming.progress.ProcessCommitter``
        (role='sink') — the fork's migration-progress reporting
        (README.md:113; BaseProcessCommitter.java). The replay loop feeds
        it per-batch counts it already has (the fused probe's row count,
        the commit's lineage rows, the quarantine write), so reporting
        adds no Spark jobs to the hot path."""
        self.spark = spark
        self.table = table
        self.smt_chain = smt_chain or []
        self.salt_factor = salt_factor
        self.compact_depth = compact_depth
        self.quarantine = quarantine
        self.tombstones_on_delete = tombstones_on_delete
        self.committer = committer
        #: fold the schema-history ledger into one checkpoint line once it
        #: accumulates this many op entries (VERDICT r4 #1 — the ledger and
        #: its restart replay stay O(threshold) instead of growing with
        #: stream lifetime; the reference's breakpoint ledger likewise
        #: expires applied offsets, BreakPointRecord.java:116). 0 disables.
        self.history_compact_threshold = history_compact_threshold
        #: auto-expire table versions down to this many after each committed
        #: batch (Iceberg snapshot expiration) — bounds manifest count and
        #: the per-version lineage with it. None (default) keeps every
        #: version for time travel; long-running streams should set it.
        self.expire_keep = expire_keep
        #: open-tail-transaction rows deferred across replay calls
        self._tx_carry: DataFrame | None = None
        #: fused-probe facts about _tx_carry ({"tx","p","nd","nb"}) — lets
        #: the replay loop split carry-prefixed batches with zero extra jobs
        self._carry_meta: dict | None = None
        if not table.exists():
            table.create(REPO_PAYLOAD_SCHEMA)

    def _lineage_events_since(self, v0: int) -> int:
        """Rows the versions after ``v0`` committed (upserts + deletes,
        from their manifests' own lineage — driver-side file reads, no
        Spark job). Compaction/heartbeat entries carry zero events, so a
        multi-segment DDL batch sums its segments and nothing else."""
        total = 0
        for v in range(v0 + 1, self.table.manifest()["version"] + 1):
            try:
                entries = self.table.manifest(v).get("lineage", [])
            except FileNotFoundError:  # expired under expire_keep
                continue
            # "events" is the bucket's total applied rows (upserts AND
            # deletes — "deletes"/"upserts" are its breakdown)
            total += sum(e.get("events", 0) for e in entries)
        return total

    def _quarantine_rows(self, batch_id: str, since: float | None = None) -> int:
        """Row count of this batch's quarantine dir via parquet footers
        (pyarrow, driver-side — no Spark job); 0 when nothing was
        quarantined (the common case: the dir doesn't exist).

        ``since``: wall-clock taken just before the apply — a dir OLDER
        than it predates this apply (a reused batch id, e.g. a second
        carry flush on the same root; the write is mode=overwrite so a
        fresh quarantine always refreshes the dir mtime) and must not be
        re-counted as this batch's failures (review r5 finding)."""
        safe = batch_id.replace("/", "_").replace(".", "_")
        qdir = os.path.join(self.table.root, "quarantine", safe)
        if not os.path.isdir(qdir):
            return 0
        if since is not None and os.path.getmtime(qdir) < since:
            return 0
        import pyarrow.parquet as pq

        return sum(
            pq.read_metadata(os.path.join(qdir, fn)).num_rows
            for fn in os.listdir(qdir)
            if fn.endswith(".parquet")
        )

    def read_quarantine(self):
        from debezium_spark.operators.quarantine import read_quarantine

        return read_quarantine(self.spark, self.table.root)

    # ---- snapshot-then-stream handoff (SURVEY §2.2 / §3) -----------------

    def bootstrap(self, snapshot_env: DataFrame, fence: tuple[str, int]) -> int | None:
        """Apply the initial snapshot (op='r' events) pinned at ``fence``.

        The reference needs global read locks + SHOW MASTER STATUS to pin
        the handoff point (MySqlSnapshotChangeEventSource.java:167-222);
        here the snapshot rows and their fence commit atomically, giving the
        same consistent handoff lock-free."""
        return self.apply_envelope_batch(snapshot_env, batch_id="snapshot", fence=fence)

    def backfill(self, chunk_env: DataFrame, batch_id: str = "backfill") -> int | None:
        """Incremental-snapshot backfill (DBLog, SURVEY §2.2): re-read a
        chunk of the source mid-stream without stopping the stream.

        The reference interleaves chunk reads with streaming via
        open/close-window signals and a key-dedupe buffer
        (``AbstractIncrementalSnapshotChangeEventSource.java:73,136-146``).
        Under ordered micro-batches the same semantics need no signals: the
        chunk is stamped *at* the committed fence with
        ``source.snapshot='incremental'``, and ``resolution_pos`` gives
        chunk rows a sub-position strictly above every applied event at
        pos <= fence and strictly below the first unapplied real event at
        fence+1 — exactly the DBLog outcome (chunk overwrites stale state,
        stream events after the window win). The fence itself does NOT
        advance: source.pos is a dense event index, so the event at fence+1
        is real and not yet applied; advancing past it would drop it on the
        next fence skip. The backfill commit instead bypasses the
        fence-equality skip (``fence_check=False``) — re-running it after a
        crash is idempotent (same rows, same encoded positions)."""
        cur = self.table.fence()
        file = cur[0] if cur else "binlog.000000"
        # -1 = "nothing applied yet" (the snapshot-fence convention: events
        # start at pos 0) — a 0 here would claim event 0 as applied and the
        # fence skip would silently drop it on the next replay
        pos = cur[1] if cur else -1
        chunk = chunk_env.withColumn(
            "source",
            F.col("source")
            .withField("pos", F.lit(pos).cast("long"))
            .withField("file", F.lit(file))
            .withField("snapshot", F.lit("incremental")),
        )
        return self.apply_envelope_batch(
            chunk, batch_id=batch_id, fence=(file, pos), fence_check=False
        )

    # ---- one micro-batch --------------------------------------------------

    #: hard cap on barrier rows collected to the driver per batch — DDL is a
    #: control-plane trickle; a batch carrying more than this is malformed
    #: (protects driver memory: the collect pulls `after.content` rows in).
    MAX_BARRIERS_PER_BATCH = 1024

    def apply_envelope_batch(
        self,
        env: DataFrame,
        batch_id: str,
        fence: tuple[str, int] | None = None,
        has_ddl: bool | None = None,
        fence_check: bool = True,
        has_bad: bool | None = None,
    ) -> int | None:
        # Fence from the *pre-SMT* batch: SMTs may drop every row (e.g.
        # skipped-operations on an all-delete batch) but the source offsets
        # are still consumed — the fence must advance anyway (offset-bearing
        # heartbeat, reference heartbeat/Heartbeat.java:27-79; without this
        # a quiet table's fence goes stale, the slot-retention failure).
        if fence is None:
            # Direct (non-replay-loop) callers land here without the loop's
            # fused probe, and previously paid up to THREE narrow jobs per
            # batch: this fence aggregation plus the has_bad and has_ddl
            # probes below. When no SMT chain separates the pre-SMT fence
            # view from the post-SMT validity view, ONE flat aggregation
            # answers all of them (guide §1.2 — per-batch serial driver
            # time is the scaling bottleneck; same move as fused_tail_probe
            # on the replay/stream paths).
            aggs = [
                F.max("source.pos").alias("p"), F.max("source.file").alias("f")
            ]
            fuse_flags = not self.smt_chain and (has_bad is None or has_ddl is None)
            if fuse_flags:
                aggs.append(
                    F.max(F.col("op").isin(BARRIER_OPS).cast("int")).alias("nd")
                )
                aggs.append(
                    F.max(
                        _reason_col(env, self.table.key_cols).isNotNull().cast("int")
                    ).alias("nb")
                )
            mm = env.select(*aggs).first()
            if fuse_flags:
                if has_bad is None:
                    has_bad = bool(mm["nb"])
                if has_ddl is None:
                    has_ddl = bool(mm["nd"])
            if mm["p"] is None or mm["f"] is None:
                # Every row is missing part of its offset (pos, or — under
                # the file-major key — file): there is nothing to fence,
                # but the rows themselves are poison records, not silence:
                # route them through quarantine before declaring the batch
                # a no-op — or, in strict mode, fail loudly (one bad row
                # never wedges OR vanishes; final review r5 closed the
                # strict-mode vanish on this path too).
                _, bad = split_valid(env, self.table.key_cols)
                if has_bad if has_bad is not None else bad.limit(1).count() > 0:
                    if self.quarantine:
                        write_quarantine(bad, self.table.root, batch_id)
                    else:
                        raise ValueError(
                            f"batch {batch_id}: offset-less malformed "
                            "records in strict mode — construct the engine "
                            "with quarantine=True to divert such rows"
                        )
                return None
            fence = (mm["f"], mm["p"])

        for smt in self.smt_chain:
            env = smt(env)

        if self.quarantine:
            good, bad = split_valid(env, self.table.key_cols)
            # narrow probe (op/key/offset columns only) unless the replay
            # loop's fused pre-pass already answered it; quarantine is the
            # exception path, so the common case costs nothing extra
            if has_bad is None:
                has_bad = bad.limit(1).count() > 0
            if has_bad:
                write_quarantine(bad, self.table.root, batch_id)
            env = good
        else:
            # strict mode: a malformed row FAILS the batch loudly (Kafka
            # Connect errors.tolerance=none — the reference's default when
            # no fail-SQL ledger is configured). Letting it continue would
            # not "flow into the merge": the three-valued segment and
            # control-op filters below silently DROP a null-offset or
            # null-op row, losing data with no trace (final review r5).
            good, bad = split_valid(env, self.table.key_cols)
            if has_bad is None:
                has_bad = bad.limit(1).count() > 0
            if has_bad:
                # ADVICE r5: a fused probe's has_bad covers the whole batch,
                # but after a tail-transaction carve the malformed row may
                # sit in the deferred carry — `bad` over the closed part is
                # then empty and first() returns None; keep the intended
                # ValueError (the row still fails when its carry applies)
                row = bad.select(
                    _reason_col(bad, list(self.table.key_cols)).alias("r")
                ).first()
                reason = (
                    row["r"] if row is not None
                    else "deferred with the open-transaction carry"
                )
                raise ValueError(
                    f"batch {batch_id}: malformed record ({reason}) in "
                    "strict mode — construct the engine with "
                    "quarantine=True to divert such rows instead"
                )

        # Barrier segmentation: DDL ('l') and TRUNCATE ('t') rows split the
        # batch — events before a barrier merge under the old table state,
        # events after under the new. Barriers are rare, so detection must
        # not decode the (wide) content column for the whole batch: first a
        # cheap op-column-only probe (or the hint the replay loop computed in
        # its offset aggregate), and only if non-zero the content collect
        # (parquet column pruning makes the probe read just `op`).
        if has_ddl is None:
            has_ddl = env.filter(F.col("op").isin(BARRIER_OPS)).limit(1).count() > 0
        if has_ddl:
            # DDL text source: the wire path carries it in a `_ddl_text`
            # side column (arbitrary payload schemas have no `content`
            # field); the native envelope path reads after.content; a
            # payload with neither yields text-less barriers (segmentation
            # still splits, nothing to apply)
            if "_ddl_text" in env.columns:
                text_col = F.col("_ddl_text").alias("content")
            elif "content" in env.schema["after"].dataType.fieldNames():
                text_col = F.col("after.content").alias("content")
            else:
                text_col = F.lit(None).cast("string").alias("content")
            # bounded collect: barriers are control-plane rows; cap protects
            # the driver from a malformed batch full of op='l' rows
            ddls = (
                # null-file barriers are excluded: their segment fence
                # (file-major) would sort below EVERY real fence and
                # silently fence-skip the preceding segment's valid rows
                # (review r5). With quarantine on they were already split
                # out as null_offset; this guards the quarantine-off path.
                env.filter(
                    F.col("op").isin(BARRIER_OPS)
                    & F.col("source.file").isNotNull()
                    & F.col("source.pos").isNotNull()
                )
                .select("source.file", "source.pos", "op", "ts_ms",
                        F.col("source.db").alias("db"),
                        F.col("source.table").alias("tbl"), text_col)
                .orderBy(F.coalesce(F.col("file"), F.lit("")), "pos")
                .limit(self.MAX_BARRIERS_PER_BATCH + 1)
                .collect()
            )
            if len(ddls) > self.MAX_BARRIERS_PER_BATCH:
                raise ValueError(
                    f"batch {batch_id} carries >{self.MAX_BARRIERS_PER_BATCH} "
                    "DDL/TRUNCATE barrier rows — refusing unbounded driver collect"
                )
            dml = env.filter(~F.col("op").isin(BARRIER_OPS))
        else:
            ddls = []
            dml = env
        # payload-free control rows ('m' message, 'i' index, 'ts' snapshot
        # marker, 'p' slice pointer): their offsets are consumed (the fence
        # already covers them) but they carry no row data — drop them from
        # the merge instead of letting null payloads reach the dedupe
        dml = dml.filter(~F.col("op").isin(CONTROL_OPS))
        if "_ddl_text" in dml.columns:
            dml = dml.drop("_ddl_text")

        cur = self.table.fence()
        # every fence comparison is file-major via offset_key (schema.py
        # offset-order contract); the intra-batch SEGMENT filters below stay
        # on the long pos — contract-equivalent, cheaper per row
        if fence_check and cur is not None and offset_key(*fence) <= offset_key(*cur):
            return None  # whole batch already applied (resume skip)

        version = None
        seg_start = -(1 << 62)
        for i, d in enumerate(list(ddls) + [None]):
            seg_end = d["pos"] if d is not None else (1 << 62)
            seg = dml.filter(
                (F.col("source.pos") > seg_start) & (F.col("source.pos") < seg_end)
            )
            # the segment's fence is the offset just below its closing
            # barrier — in the BARRIER's file, not the batch-max file (a
            # multi-file batch would otherwise record a (later-file,
            # earlier-pos) pair that breaks file-major ordering)
            seg_fence = (d["file"], d["pos"] - 1) if d is not None else fence
            version = (
                self._merge_segment(seg, f"{batch_id}/s{i}", seg_fence, fence_check)
                or version
            )
            if d is not None:
                cur = self.table.fence()
                if cur is None or offset_key(d["file"], d["pos"]) > offset_key(*cur):
                    if d["op"] in (TRUNCATE_OP, TRUNCATE_CASCADE_OP):
                        version = self.table.truncate(
                            (d["file"], d["pos"]), batch_id=f"{batch_id}/t{i}"
                        )
                    elif d["op"] == PATH_OP:
                        # fork PATH record: content = location of a slice
                        # set exported by the full-migration tool; load it
                        # as op='r' snapshot rows pinned AT this position
                        # (RelationalChangeRecordEmitter.java:89-101 PATH
                        # emit; OpengaussSnapshotChangeEventSource slice
                        # export). Missing content = plain control row.
                        if d["content"]:
                            from debezium_spark.sources.slices import (
                                load_csv_slices,
                                snapshot_envelope,
                            )

                            rows = load_csv_slices(
                                self.spark.read.parquet(d["content"])
                            )
                            version = self._merge_segment(
                                snapshot_envelope(rows, d["file"], d["pos"]),
                                f"{batch_id}/p{i}",
                                (d["file"], d["pos"]),
                                fence_check,
                            ) or version
                    else:
                        # TRUNCATE TABLE arriving as SQL *text* (op='l')
                        # routes to the same truncate barrier as op='t' —
                        # but only when the statement names THIS capture
                        # (the row's source identity): a multi-statement
                        # script may truncate some OTHER table, which must
                        # stay history-only here. apply_ddl handles column
                        # evolution + the history ledger (table-level ops
                        # are history-only there).
                        if d["content"] is not None:
                            def _targets_self(op_) -> bool:
                                _, op_db, op_tbl = op_[0], op_[1], op_[2]
                                if d["tbl"] is not None and op_tbl != d["tbl"]:
                                    return False
                                if (op_db is not None and d["db"] is not None
                                        and op_db != d["db"]):
                                    return False
                                return True
                            if any(
                                o[0] == "truncate_table" and _targets_self(o)
                                for o in parse_ddl(d["content"])
                            ):
                                version = self.table.truncate(
                                    (d["file"], d["pos"]), batch_id=f"{batch_id}/t{i}"
                                )
                            # barrier ts_ms resolves CURRENT_TIMESTAMP-class
                            # defaults deterministically (schema_evolution.
                            # resolve_default_marker)
                            apply_ddl(self.table, d["content"],
                                      (d["file"], d["pos"]), ts_ms=d["ts_ms"])
            seg_start = seg_end
        self._maintain_ledgers(applied_ddl=bool(ddls), committed=version is not None)
        return version

    def _maintain_ledgers(self, applied_ddl: bool, committed: bool) -> None:
        """Post-batch ledger upkeep (VERDICT r4 #1 — bounded control state
        at the 10^5+-batch design point): fold the schema-history ledger
        into its checkpoint once it exceeds ``history_compact_threshold``
        op entries (checked only on batches that carried DDL — the ledger
        grows only then), and expire old table versions down to
        ``expire_keep`` after a committed batch. Both are driver-local file
        operations, O(threshold) and O(n_versions) — no Spark jobs."""
        if applied_ddl and self.history_compact_threshold:
            from debezium_spark.operators.schema_evolution import (
                compact_schema_history,
            )

            # threshold check and fold share ONE ledger read (review r5)
            compact_schema_history(
                self.table, min_entries=self.history_compact_threshold
            )
        if committed and self.expire_keep is not None:
            self.table.expire_versions(keep_last=self.expire_keep)

    def heartbeat(self, fence: tuple[str, int]) -> int | None:
        """Offset-bearing heartbeat (reference ``heartbeat/Heartbeat.java:
        27-79``): advance the fence with an empty commit when the source
        reports progress but no rows reach the sink (idle table, or every
        row SMT-filtered). Keeps the fence fresh so upstream log/slot
        retention can truncate. No-op if the fence would not advance."""
        cur = self.table.fence()
        if cur is not None and offset_key(*fence) <= offset_key(*cur):
            return None
        self.table.commit_buckets(
            {},
            [],
            fence,
            [{"batch": "heartbeat", "bucket": -1, "events": 0, "deletes": 0,
              "upserts": 0, "heartbeat": True, "fence_pos": fence[1]}],
        )
        if self.committer:
            # liveness line: counters unchanged, timestamp fresh — the
            # reference's idle reporter keeps emitting so controllers can
            # distinguish "idle" from "dead" (paced by the interval)
            self.committer.commit()
        return self.table.manifest()["version"]

    def _merge_segment(
        self,
        env: DataFrame,
        batch_id: str,
        fence: tuple[str, int],
        fence_check: bool = True,
    ) -> int | None:
        split = split_pk_changes(
            env, self.table.key_cols, tombstones_on_delete=self.tombstones_on_delete
        )
        if self.tombstones_on_delete:
            # tombstones are wire-format markers; the merge consumes the
            # delete itself (same final state, asserted in tests)
            split = split.filter(~F.col("_tombstone")).drop("_tombstone")
        changes = compute_changes(split, self.table.key_cols)
        v = merge_changes(
            self.table, changes, fence, batch_id,
            salt_factor=self.salt_factor, fence_check=fence_check,
        )
        if self.table.mode == "mor" and self.compact_depth:
            # Selective AND spread (VERDICT r5 #2): fold only buckets that
            # actually got deep, and at most K of them per batch, deepest
            # first. Under uniform traffic every bucket crosses the depth
            # threshold in the SAME batch — the r5 sf1 run paid a 123.7 s
            # end-of-log batch when all 64 buckets compacted at once. With
            # K = ceil(n_buckets / compact_depth) the steady-state cadence
            # compacts the whole table once per compact_depth batches (same
            # amortized work) while bounding any one batch's compaction to
            # K bucket rewrites; transient depth stays <= ~2x the threshold
            # during the first cycle, then buckets stagger naturally.
            depths = self.table.bucket_depths(self.compact_depth)
            if depths:
                k = max(1, -(-self.table.n_buckets // self.compact_depth))
                deep = sorted(depths, key=lambda b: (-depths[b], b))[:k]
                v = self.table.compact(
                    buckets=sorted(deep), batch_id=f"{batch_id}/compact"
                ) or v
        return v

    #: auto-sizing floor/shape for incremental-snapshot chunks: each chunk is
    #: one fence commit, so the commit count must stay bounded at any table
    #: size — chunks auto-size to rows/(defaultParallelism × MULT), floored
    #: (at 10^10 rows on 1000 executors×8 slots that is ~4×8000 commits of
    #: ~300k rows each, vs 10^5 serial commits at a fixed 100k chunk_size)
    CHUNK_SIZE_FLOOR = 100_000
    CHUNK_PAR_MULT = 4

    def incremental_snapshot(
        self,
        source_rows: DataFrame,
        chunk_size: int | None = None,
        batch_id: str = "incr-snap",
    ) -> int:
        """DBLog-style chunked re-snapshot of a live table, mid-stream: the
        orchestration loop the reference drives from an execute-snapshot
        signal (``signal/ExecuteSnapshot.java`` →
        ``AbstractIncrementalSnapshotChangeEventSource.java``). The source
        is split into chunks; each chunk goes through ``backfill``
        (fence-pinned, sub-positioned — stream events newer than the window
        still win). Returns the number of chunks.

        ``chunk_size=None`` (default) auto-sizes: ``max(CHUNK_SIZE_FLOOR,
        rows / (defaultParallelism × CHUNK_PAR_MULT))`` — the chunk count
        (= serial fence-commit count, the scaling bottleneck of this loop)
        is then bounded by parallelism × CHUNK_PAR_MULT at ANY table size,
        while small tables keep full-floor chunks. An explicit chunk_size
        is honored verbatim (the reference's incremental.snapshot.chunk.size
        knob).

        ``source_rows`` is an op='r' envelope DataFrame (same shape as
        ``bootstrap``'s input). Chunks are assigned by *key hash*, not a
        key-range sort: assignment is then a deterministic pure function of
        the row (no global single-task sort, no window re-evaluation per
        chunk, no tie-break nondeterminism), every chunk is a consistent
        key subset, and the scan parallelizes fully. The source is cached
        for the loop (each chunk filter re-scans it otherwise)."""
        n = source_rows.count()
        if n == 0:
            return 0
        if chunk_size is None:
            par = max(1, self.spark.sparkContext.defaultParallelism)
            chunk_size = max(self.CHUNK_SIZE_FLOOR,
                             -(-n // (par * self.CHUNK_PAR_MULT)))
        n_chunks = max(1, (n + chunk_size - 1) // chunk_size)
        key_hash = F.xxhash64(*[F.col(f"after.{c}") for c in self.table.key_cols])
        chunked = source_rows.withColumn(
            "_chunk", F.pmod(key_hash, F.lit(n_chunks))
        ).persist()
        try:
            for c in range(n_chunks):
                chunk = chunked.filter(F.col("_chunk") == c).drop("_chunk")
                self.backfill(chunk, batch_id=f"{batch_id}/c{c:04d}")
        finally:
            chunked.unpersist()
        return n_chunks

    # ---- coordinator: snapshot-mode selection + replay ---------------------

    def run(
        self,
        batch_dir: str,
        snapshot_env: DataFrame | None = None,
        snapshot_mode: str = "initial",
        snapshot_fence: tuple[str, int] = ("binlog.000001", -1),
    ) -> list[int]:
        """Snapshot-then-stream coordinator with mode selection — the
        reference's snapshot.mode config (``MySqlConnectorConfig``
        SnapshotMode; coordinator ordering
        ``ChangeEventSourceCoordinator.java:96-165``):

        - ``initial``: bootstrap the snapshot, then stream (default);
        - ``initial_only``: bootstrap the snapshot, then STOP — no
          streaming (``MySqlConnectorConfig.java:131-167`` INITIAL_ONLY);
        - ``when_needed``: bootstrap only if this table has no committed
          fence yet (fresh table or lost offsets) — otherwise stream only;
        - ``never``: stream only;
        - ``schema_only``: commit the snapshot *fence* (so streaming starts
          from "now") but none of its rows — the reference's
          schema_only/no-data mode;
        - ``schema_only_recovery``: rebuild the table schema by replaying
          the ``_schema_history.jsonl`` ledger (idempotent alters), then
          stream — the reference's recovery mode for a lost/corrupted
          schema history topic.
        """
        modes = ("initial", "initial_only", "when_needed", "never",
                 "schema_only", "schema_only_recovery")
        if snapshot_mode not in modes:
            raise ValueError(f"unknown snapshot_mode {snapshot_mode!r}")
        need = (
            snapshot_mode in ("initial", "initial_only")
            or (snapshot_mode == "when_needed" and self.table.fence() is None)
        )
        if need:
            if snapshot_env is None:
                raise ValueError(f"snapshot_mode={snapshot_mode!r} requires snapshot_env")
            self.bootstrap(snapshot_env, fence=snapshot_fence)
            if snapshot_mode == "initial_only":
                return []  # snapshot-and-stop: the stream is never opened
        elif snapshot_mode == "schema_only" and self.table.fence() is None:
            self.heartbeat(snapshot_fence)  # fence-only commit, zero rows
        elif snapshot_mode == "schema_only_recovery":
            self.recover_schema()
        return self.replay(batch_dir)

    def recover_schema(self) -> int:
        """Replay the ``_schema_history.jsonl`` ledger onto the table —
        every alter is idempotent, so replaying the full history converges
        to the pre-loss schema (``AbstractDatabaseHistory.java`` recovery;
        reference mode SCHEMA_ONLY_RECOVERY). Returns the number of ledger
        entries replayed. The ledger itself is NOT re-appended.

        Compacted ledgers: entries folded into a checkpoint
        (``compact_schema_history``) no longer exist per-op, so recovery
        must start from the checkpoint's full schema state and replay the
        post-checkpoint tail on top — correct from ANY starting incarnation
        by construction (the checkpoint pins the exact state the tail
        entries originally applied from; every alter is idempotent). The
        restore+replay composes in a SCRATCH manifest dir and publishes the
        final state to the live table in ONE ``restore_schema`` call
        (review r5: restoring the live table first and replaying the tail
        as separate manifest publishes opened a crash window — a current
        table transiently reverted to the checkpoint state, and a crash
        before the tail replay made the revert permanent because
        ``apply_ddl``'s idempotency scan skips redelivered barriers).
        ``restore_schema`` no-ops when the live state already matches, so
        recovery on a current table publishes nothing."""
        import shutil
        import tempfile

        from debezium_spark.operators.schema_evolution import (
            schema_history_split,
        )

        cp, entries = schema_history_split(self.table)
        if cp is None:
            # no checkpoint: replay per-op onto the live table — every
            # alter no-ops when already applied, so there is no transient
            # revert and no crash window on this path
            self._replay_history_ops(self.table, entries)
            return len(entries)
        scratch_dir = tempfile.mkdtemp(prefix="recover_schema_")
        try:
            scratch = LakeTable(
                self.spark, scratch_dir, list(self.table.key_cols),
                n_buckets=self.table.n_buckets, mode=self.table.mode,
            )
            scratch.create(StructType.fromJson(json.loads(cp["schema"])))
            scratch.restore_schema(
                cp["schema"], renames=cp.get("renames"), dropped=cp.get("dropped")
            )
            self._replay_history_ops(scratch, entries)
            man = scratch.manifest()
            final_schema = man["schema"]
            final_renames = man.get("renames", {})
            final_dropped = man.get("dropped", [])
        finally:
            shutil.rmtree(scratch_dir, ignore_errors=True)
        self.table.restore_schema(
            final_schema, renames=final_renames, dropped=final_dropped
        )
        return len(entries)

    @staticmethod
    def _replay_history_ops(table: LakeTable, entries: list[dict]) -> None:
        """Apply schema-history ledger entries per-op onto ``table`` —
        the shared tail-replay used by ``recover_schema`` both directly
        (no checkpoint) and against the scratch manifest (checkpointed
        ledgers).

        Replay tolerance: every op recorded here was applied ONCE by
        ``apply_ddl``, so when a replay raises from an alter's strictness
        guard the only possible cause is that the table already carries
        the op's effect in a later-evolved form — e.g. replaying
        ``add x`` after ``x`` was renamed to ``y`` hits the burned-name
        guard, and the first hop of a rename chain ``a→b→c`` finds
        neither name (final review r5: the raise wedged no-checkpoint
        recovery on a healthy table, where the docstring promised
        convergence). Those ops skip; recovery converges to the evolved
        state. The checkpoint path replays from the exact pinned state,
        so the tolerance never engages there."""
        for e in entries:
            for op in e.get("ops", []):
                kind = op[0]
                try:
                    CdcEngine._replay_one_history_op(table, kind, op)
                except ValueError:
                    continue

    @staticmethod
    def _replay_one_history_op(table: LakeTable, kind: str, op) -> None:
        if kind == "add":
            # 4-element ops carry a DEFAULT literal (r4+ ledgers)
            table.alter_add_columns([tuple(op[1:4])])
        elif kind == "drop":
            table.alter_drop_columns([op[1]])
        elif kind == "rename":
            table.alter_rename_column(op[1], op[2])
        elif kind == "widen":
            table.alter_widen_column(op[1], op[2])
        elif kind == "reorder":
            # cosmetic placement only — tolerance in the caller
            table.alter_reorder_column(op[1], op[2])
        elif kind == "set_default":
            from debezium_spark.operators.schema_evolution import (
                CURRENT_TS_MARKER,
            )

            # an unresolved now-function marker is history-only
            # (apply_ddl had no barrier ts); replaying it would set
            # CURRENT_DEFAULT to the raw sentinel
            if op[2] != CURRENT_TS_MARKER:
                table.alter_set_default(op[1], op[2])
        # table-level ops are catalog history, not column state

    # ---- replay loop -------------------------------------------------------

    def replay(self, batch_dir: str, tx_aligned: bool = True, final: bool = True) -> list[int]:
        """Replay all batches beyond the committed fence, in order.

        Cheap skip: per-batch max offset from a parquet min/max agg (column
        stats only) before touching the data — the analog of the breakpoint
        filter at TableReplayTask.java:132-144.

        ``tx_aligned``: a transaction whose events straddle two batch files
        must not commit as two fenced commits (a crash between them would
        expose a half-applied transaction — the reference applies whole
        transactions, TransactionReplayTask.java). The batch's open tail
        transaction (see ``split_open_tail_tx``) is deferred into the next
        batch; the split is a pure function of the batch content, so a
        crash-resume recomputes the identical segmentation and the
        fence-check keeps everything idempotent. After the last batch the
        remaining carry is flushed (end of log closes the transaction).
        Zero extra cost for streams without transaction metadata (the probe
        rides the existing fused aggregation).

        The carry lives on the engine across ``replay`` calls; only the
        CALLER knows whether the log is complete. One-shot replays of a
        finished log (the default, ``final=True``) flush the last open
        transaction at the end — a binlog only contains committed
        transactions, so end-of-log closes it. A caller that re-replays a
        GROWING directory as files arrive passes ``final=False`` and calls
        ``flush_tx_carry`` at true end-of-stream. On
        crash-resume the carry is reconstructed deterministically from the
        re-read batch (its max pos is beyond the committed fence, and
        re-carried duplicate rows collapse in the merge's last-wins
        dedupe)."""
        versions = []
        # open-tail tx awaiting its END — reload from disk after a restart,
        # together with its fused-probe meta (tx id, max pos, flags)
        carry: DataFrame | None = self._tx_carry
        cm: dict | None = self._carry_meta
        if carry is None:
            carry = load_tx_carry(self.spark, self.table.root)
            cm = load_tx_carry_meta(self.table.root) if carry is not None else None
        if not tx_aligned and carry is not None:
            # a previously deferred transaction predates every batch here
            # (ordered log) — flush it FIRST: applying the new batches would
            # advance the fence past the carry's offsets and the end-of-loop
            # flush would then fence-skip it into oblivion (review r4: the
            # carried transaction's rows were permanently lost)
            self._tx_carry, self._carry_meta = carry, cm
            v = self.flush_tx_carry()
            if v is not None:
                versions.append(v)
            carry, cm = None, None
        paths = list_batches(batch_dir)
        for i, path in enumerate(paths):
            is_final_batch = final and i == len(paths) - 1
            env = read_batch(self.spark, path)
            # ONE narrow-column pass answers every per-batch probe: offset
            # fence, DDL presence, malformed-row presence, tail-transaction
            # id AND the tail-transaction boundary (per-batch serial driver
            # time is the scaling bottleneck, so everything rides this
            # single job — fused_tail_probe, shared with MultiTableEngine).
            mm = fused_tail_probe(
                env,
                flags={
                    "nd": F.col("op").isin(BARRIER_OPS),
                    "nb": _reason_col(env, self.table.key_cols).isNotNull(),
                },
                with_file=True,
            )
            cur = self.table.fence()
            if mm["p"] is None or mm["f"] is None:
                # no fully-positioned row in the whole batch (null pos, or
                # null file under the file-major key — offset_key(None, p)
                # sorts below every real fence, so the skip below would
                # silently drop such rows; review r5) — but ngrp > 0 means
                # the batch HAS rows (all-null-offset poison): they must
                # reach quarantine, not silently vanish with the skip
                # ('one bad row never wedges OR vanishes')
                if mm["ngrp"]:
                    t0 = _time.time()
                    self.apply_envelope_batch(env, batch_id=f"batch_{i:05d}")
                    if self.committer:
                        self.committer.record_sink_batch(
                            extracted=mm["n"], success=0,
                            failed=self._quarantine_rows(
                                f"batch_{i:05d}", since=t0),
                        )
                continue
            if (
                carry is None
                and cur is not None
                and offset_key(mm["f"], mm["p"]) <= offset_key(*cur)
            ):
                if self.committer:
                    # exactly-once skip = the reference's breakpoint skip;
                    # its committer counts these as skippedCount
                    self.committer.record_sink_batch(
                        extracted=mm["n"], success=0, skipped=mm["n"]
                    )
                continue
            fence = (mm["f"], mm["p"])
            has_ddl: bool | None = bool(mm["nd"])
            # the fused probe sees pre-SMT rows; with SMTs installed a
            # transform could corrupt a row, so fall back to the
            # post-SMT probe in that case
            has_bad: bool | None = bool(mm["nb"]) if not self.smt_chain else None
            tail_tx = mm["tt"]
            had_carry = carry is not None
            tx_engaged = tx_aligned and (had_carry or tail_tx is not None)
            if tx_engaged:
                fused = not had_carry or cm is not None  # legacy carry: probe
                if had_carry:
                    env = carry.unionByName(env)
                    # the union's flags = this batch's OR the carry's (the
                    # carry meta recorded its own); True is a safe over-
                    # approximation (costs one empty control-plane pass),
                    # False is exact. A meta-less legacy carry → re-probe.
                    if fused:
                        has_ddl = bool(mm["nd"]) or bool(cm["nd"])
                        has_bad = (
                            (bool(mm["nb"]) or bool(cm["nb"]))
                            if not self.smt_chain else None
                        )
                    else:
                        has_ddl = None
                        has_bad = None
                if is_final_batch:
                    # log complete: the last batch's tail transaction is
                    # closed by end-of-log — commit it in THIS batch (no
                    # separate flush commit; disk carry clears after the
                    # apply below, which still lazily reads it)
                    carry, cm = None, None
                else:
                    # zero-job split: the fused probe already knows the tail
                    # tx and its run start; boundary cases live in ONE place
                    # (derive_tx_boundary, shared with MultiTableEngine)
                    probe = None
                    if fused:
                        probe = {
                            "p": mm["p"], "tt": tail_tx,
                            "boundary": derive_tx_boundary(mm, cm, had_carry),
                        }
                    closed, carry, boundary = split_open_tail_tx(env, probe=probe)
                    whole_open = closed is None
                    if carry is not None and fused:
                        # meta for the NEW carry: the deferred run is the
                        # batch's tail group (+ the old carry when the same
                        # tx straddles); whole-union deferral folds the
                        # global flags in
                        nd_c = bool(mm["nd"] if whole_open else mm["tail_nd"])
                        nb_c = bool(mm["nb"] if whole_open else mm["tail_nb"])
                        if had_carry and (whole_open or cm["tx"] == tail_tx):
                            nd_c = nd_c or bool(cm["nd"])
                            nb_c = nb_c or bool(cm["nb"])
                        cm = {"tx": tail_tx, "p": mm["p"], "nd": nd_c, "nb": nb_c}
                    elif carry is not None:
                        cm = None  # legacy carry stays legacy until flushed
                    else:
                        cm = None
                    if whole_open:
                        # whole batch = one still-open transaction; nothing
                        # commits, so materialize the carry immediately
                        carry = persist_tx_carry(
                            self.spark, carry, self.table.root, meta=cm
                        )
                        if self.committer:
                            # extracted but deferred whole: parked rows
                            # surface as the reference's `rest` (in-pipe)
                            self.committer.record_sink_batch(
                                extracted=mm["n"], success=0,
                                deferred=mm["n"],
                            )
                        continue
                    env = closed
                    if carry is not None:
                        fence = (mm["f"], boundary)
            v_before = (
                self.table.manifest()["version"] if self.committer else 0
            )
            t0 = _time.time()
            v = self.apply_envelope_batch(
                env,
                batch_id=f"batch_{i:05d}",
                fence=fence,
                has_ddl=has_ddl,
                has_bad=has_bad,
            )
            if self.committer:
                # extracted = THIS file's rows; a deferred tail parks
                # (exact count from the fused probe's tail group) and
                # drains when a later batch/flush applies it
                self.committer.record_sink_batch(
                    extracted=mm["n"],
                    success=self._lineage_events_since(v_before),
                    failed=self._quarantine_rows(f"batch_{i:05d}", since=t0),
                    deferred=(
                        mm["tail_n"]
                        if tx_engaged and carry is not None
                        else 0
                    ),
                    # a closed batch prepends the WHOLE persisted carry, so
                    # the parked pool drains here — explicit, not inferred
                    # from the residual (final review r5: the inference
                    # confounded carry-drain with last-wins collapse)
                    drained_carry=tx_engaged and had_carry,
                )
            if tx_engaged:
                # materialize AFTER the closed part committed: the closed
                # plan lazily reads the previous carry version, and a crash
                # mid-batch must resume from the PRE-batch carry (lineage
                # truncation + crash recovery; see persist_tx_carry). A
                # carry that went back to None must CLEAR the disk version
                # — a stale persisted carry would re-merge old events over
                # newer table state on restart.
                carry = persist_tx_carry(self.spark, carry, self.table.root, meta=cm)
            if v is not None:
                versions.append(v)
        self._tx_carry = carry
        self._carry_meta = cm if carry is not None else None
        if final and carry is not None:
            # only reachable when the directory was empty or every batch
            # was skipped — flush whatever was carried in from before
            v = self.flush_tx_carry()
            if v is not None:
                versions.append(v)
        if self.committer:
            # terminal force-line: per-batch lines are paced by
            # commit.time.interval, so a replay faster than the interval
            # would otherwise leave the progress file showing only the
            # first batch forever (review r5 finding)
            self.committer.commit(force=True)
        return versions

    def _report_apply(self, v_before: int, batch_id: str,
                      flush: bool = False, since: float | None = None) -> None:
        """Progress line for one directly-applied batch (streaming epoch /
        carry flush): counts derive from the commit's own lineage plus the
        quarantine write. Full extract attribution (SMT drops, last-wins
        collapse) needs the replay loop's fused probe row count, so here
        extract = applied + failed — the reference's streaming counters
        likewise tally at the replay stage. ``flush=True`` = the rows were
        already extract-counted when their original batch was read
        (deferred transaction), so they settle instead of re-extracting."""
        if not self.committer:
            return
        success = self._lineage_events_since(v_before)
        failed = self._quarantine_rows(batch_id, since=since)
        if flush:
            self.committer.record_sink_flush(success=success, failed=failed)
        else:
            self.committer.record_sink_batch(
                extracted=success + failed, success=success, failed=failed
            )

    def apply_stream_batch(
        self, env: DataFrame, batch_id: str, tx_aligned: bool = True
    ) -> int | None:
        """One streaming micro-batch (foreachBatch epoch) with the same
        transaction alignment as ``replay``: the epoch's open tail
        transaction defers (persisted carry — a checkpoint will not
        redeliver this epoch) and rejoins when its END arrives. Call
        ``flush_tx_carry`` at end of stream."""
        v_before = self.table.manifest()["version"] if self.committer else 0
        t0 = _time.time()
        if not tx_aligned:
            v = self.apply_envelope_batch(env, batch_id=batch_id)
            self._report_apply(v_before, batch_id, since=t0)
            return v
        carry = self._tx_carry
        if carry is None:
            carry = load_tx_carry(self.spark, self.table.root)
        had_carry = carry is not None
        if had_carry:
            env = carry.unionByName(env)
        # ONE fused probe per epoch (same job the replay loop runs): fence
        # offsets, tail-transaction id + run start, barrier/malformed flags.
        # Previously the stream path paid 4 separate narrow jobs per epoch —
        # the split's two aggregations plus apply_envelope_batch's fence and
        # has_bad/has_ddl probes; at 4M-event epochs each is a full-batch
        # column scan. The carry (if any) is already unioned in, so the
        # no-carry boundary derivation applies.
        mm = fused_tail_probe(
            env,
            flags={
                "nd": F.col("op").isin(BARRIER_OPS),
                "nb": _reason_col(env, self.table.key_cols).isNotNull(),
            },
            with_file=True,
        )
        self._carry_meta = None  # stream-path carries have no fused meta
        boundary = derive_tx_boundary(mm, None, False)
        closed, carry, boundary = split_open_tail_tx(
            env, probe={"p": mm["p"], "tt": mm["tt"], "boundary": boundary}
        )
        engaged = had_carry or carry is not None
        if closed is None:
            self._tx_carry = persist_tx_carry(self.spark, carry, self.table.root)
            return None
        kwargs = {}
        if mm["p"] is not None and mm["f"] is not None:
            # the closed part's fence: the tail-run boundary when a tail
            # defers, else the epoch max — in the epoch's max file, exactly
            # as the replay loop fences a deferred tail
            kwargs["fence"] = (
                mm["f"], boundary if carry is not None else mm["p"]
            )
        v = self.apply_envelope_batch(
            closed,
            batch_id=batch_id,
            has_ddl=bool(mm["nd"]),
            # pre-SMT probe: with SMTs installed a transform could corrupt
            # a row after the probe — fall back to the post-SMT probe then
            has_bad=(bool(mm["nb"]) if not self.smt_chain else None),
            **kwargs,
        )
        self._report_apply(v_before, batch_id, since=t0)
        if engaged:
            carry = persist_tx_carry(self.spark, carry, self.table.root)
        self._tx_carry = carry
        return v

    def flush_tx_carry(self, batch_id: str = "batch_txflush") -> int | None:
        """Apply the deferred open-tail transaction — call when the log is
        known complete (a binlog only ever contains committed transactions,
        so end-of-log closes it). No-op if nothing is carried."""
        carry, self._tx_carry = self._tx_carry, None
        self._carry_meta = None
        if carry is None:
            carry = load_tx_carry(self.spark, self.table.root)
        if carry is None:
            return None
        mm = carry.select(
            F.max("source.pos").alias("p"), F.max("source.file").alias("f")
        ).first()
        if mm["p"] is None:
            persist_tx_carry(self.spark, None, self.table.root)
            return None
        v_before = self.table.manifest()["version"] if self.committer else 0
        t0 = _time.time()
        v = self.apply_envelope_batch(carry, batch_id=batch_id, fence=(mm["f"], mm["p"]))
        self._report_apply(v_before, batch_id, flush=True, since=t0)
        if self.committer:
            self.committer.commit(force=True)  # end-of-stream terminal line
        persist_tx_carry(self.spark, None, self.table.root)
        return v
