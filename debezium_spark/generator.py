"""Deterministic synthetic change-log (binlog) generator.

Plays the role of the reference's streaming sources
(``debezium-connector-mysql/.../MySqlStreamingChangeEventSource.java:276-343``
and the openGauss WAL source) for this sandbox: the "database" is synthetic,
so the generator *is* the log. It emits Debezium-envelope rows over the
repo-content payload with strictly increasing ``(source.file, source.pos)``
offsets, transaction blocks, zipf-skewed hot repos (to exercise salting, per
the north rule), and update-with-PK-change events (path renames) whose split
semantics mirror ``RecordMakers.java:282-312``.

Everything is a pure Catalyst expression over ``spark.range(n)``: every
column is a deterministic function of the global event index ``id`` via
``xxhash64(seed, id, tag)``, so output is byte-identical across runs,
partition counts and parallelism levels (required by FIXTURES.md) and the
generator itself scales linearly to 10^10 events with no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_spark.schema import REPO_PAYLOAD_SCHEMA

_LANGS = ["py", "java", "c", "go", "rs", "md"]
_WORDS = [
    "def", "return", "class", "import", "for", "while", "if", "else",
    "merge", "spark", "batch", "stream", "offset", "commit", "table",
    "schema", "parse", "apply", "window", "shuffle", "bucket", "fence",
]


def _h(seed: int, *cols) -> "F.Column":
    """Deterministic 64-bit hash of (seed, *cols) — the generator's PRNG."""
    return F.xxhash64(F.lit(seed), *cols)


def _u01(seed: int, tag: str, id_col) -> "F.Column":
    """Uniform [0,1) derived from the hash (partition-invariant)."""
    return (F.pmod(_h(seed, F.lit(tag), id_col), F.lit(1_000_000)) / 1_000_000.0)


class ChangeLogGenerator:
    """Seeded generator of envelope-row DataFrames and ordered batch files.

    Event mix follows FIXTURES.md F2: ~60% c, ~25% u, ~10% d, ~5% u with
    PK change (path rename).  Keys are zipf-ish skewed over ``n_repos``
    (log-uniform rank approximation of a zipf tail) so a few repos are hot.
    """

    def __init__(
        self,
        spark: SparkSession,
        seed: int = 42,
        n_repos: int = 100,
        dirs_per_repo: int = 20,
        files_per_dir: int = 50,
        tx_size: int = 10,
        events_per_file: int = 500_000,
        content_words: int = 16,
    ) -> None:
        self.spark = spark
        self.seed = seed
        self.n_repos = n_repos
        self.dirs_per_repo = dirs_per_repo
        self.files_per_dir = files_per_dir
        self.tx_size = tx_size
        self.events_per_file = events_per_file
        self.content_words = content_words

    # ---- column builders -------------------------------------------------

    def _repo(self, id_col) -> "F.Column":
        # log-uniform rank over [1, n_repos]: rank 1 is hottest — the skew
        # that motivates salted repartition (north rule / SURVEY §4).
        u = _u01(self.seed, "repo", id_col)
        rank = F.floor(F.pow(F.lit(float(self.n_repos + 1)), u)).cast("long")
        rank = F.least(rank, F.lit(self.n_repos))
        return F.concat(F.lit("repo_"), F.lpad(rank.cast("string"), 4, "0"))

    def _path(self, id_col, tag: str) -> "F.Column":
        d = F.pmod(_h(self.seed, F.lit(tag + ".dir"), id_col), F.lit(self.dirs_per_repo))
        f = F.pmod(_h(self.seed, F.lit(tag + ".file"), id_col), F.lit(self.files_per_dir))
        lang = self._lang(id_col)
        return F.concat(
            F.lit("src/d"), d.cast("string"), F.lit("/f"), f.cast("string"),
            F.lit("."), lang,
        )

    def _lang(self, id_col) -> "F.Column":
        arr = F.array(*[F.lit(w) for w in _LANGS])
        return F.element_at(arr, (F.pmod(_h(self.seed, F.lit("lang"), id_col), F.lit(len(_LANGS))) + 1).cast("int"))

    def _content(self, id_col, prev: bool = False) -> "F.Column":
        """Deterministic pseudo-source text (~7.5 chars/word), pure Catalyst.

        ``content_words`` sizes the payload: 16 ≈ a 120-char snippet (unit
        tests), 64+ ≈ realistic source-file bodies for throughput benches."""
        arr = F.array(*[F.lit(w) for w in _WORDS])
        words = [
            F.element_at(
                arr,
                (F.pmod(_h(self.seed, F.lit(f"w{i}"), id_col), F.lit(len(_WORDS))) + 1).cast("int"),
            )
            for i in range(self.content_words)
        ]
        body = F.concat_ws(" ", *words)
        # embed the event index so every version of a row is unique; the
        # BEFORE image gets a distinct ".prev" marker (see _payload)
        suffix = F.lit(" #v-prev") if prev else F.lit(" #v")
        return F.concat(body, suffix, id_col.cast("string"))

    def _commit(self, id_col, prev: bool = False) -> "F.Column":
        tag = ":prev:" if prev else ":"
        return F.substring(
            F.sha2(F.concat(F.lit(self.seed), F.lit(tag), id_col.cast("string")), 256),
            1, 40,
        )

    def _payload(self, id_col, path_col, prev: bool = False) -> "F.Column":
        """``prev=True`` builds the BEFORE image: same row identity and word
        body (most bytes of a row don't change between versions — realistic)
        but a distinct content version marker and commit, so before != after
        for every update and changed-field diffing behaves like real CDC
        (review r4: before == after made every plain update look like a
        no-op to diff consumers). Exact prior-version content would need
        per-key history — out of scope for a stateless deterministic
        generator, and irrelevant to final-state oracles (the merge consumes
        only after + keys)."""
        return F.struct(
            self._repo(id_col).alias("repo"),
            path_col.alias("path"),
            self._commit(id_col, prev).alias("commit"),
            self._lang(id_col).alias("lang"),
            self._content(id_col, prev).alias("content"),
        )

    # ---- public API ------------------------------------------------------

    def events(self, n_events: int, start_pos: int = 0) -> DataFrame:
        """Envelope DataFrame of ``n_events`` ordered change events.

        ``source.pos`` = global event index (strictly increasing total
        order); ``source.file`` rotates every ``events_per_file`` events
        (mirrors binlog ROTATE).
        """
        df = self.spark.range(n_events).select((F.col("id") + F.lit(start_pos)).alias("id"))
        idc = F.col("id")

        u_op = _u01(self.seed, "op", idc)
        op = (
            F.when(u_op < 0.60, F.lit("c"))
            .when(u_op < 0.85, F.lit("u"))
            .when(u_op < 0.95, F.lit("d"))
            .otherwise(F.lit("u"))  # the 5% tail: u with PK change
        )
        pk_change = u_op >= 0.95

        path_after = self._path(idc, "a")
        # PK-change updates rename the path: before.path != after.path
        path_before = F.when(pk_change, self._path(idc, "b")).otherwise(path_after)

        after = F.when(op != "d", self._payload(idc, path_after))
        before = F.when(op != "c", self._payload(idc, path_before, prev=True))

        file_idx = (idc / F.lit(self.events_per_file)).cast("long") + 1
        source = F.struct(
            F.concat(F.lit("binlog."), F.lpad(file_idx.cast("string"), 6, "0")).alias("file"),
            idc.alias("pos"),
            F.concat(F.lit("gtid:"), idc.cast("string")).alias("gtid"),
            F.lit(None).cast("string").alias("snapshot"),
            F.lit("inventory").alias("db"),
            F.lit("repo_files").alias("table"),
            (F.lit(1_700_000_000_000) + idc * 10).alias("ts_ms"),
        )
        tx = F.struct(
            F.concat(F.lit("tx-"), (idc / F.lit(self.tx_size)).cast("long").cast("string")).alias("id"),
            F.pmod(idc, F.lit(self.tx_size)).alias("total_order"),
            F.pmod(idc, F.lit(self.tx_size)).alias("data_collection_order"),
        )

        return df.select(
            before.alias("before"),
            after.alias("after"),
            op.alias("op"),
            (F.lit(1_700_000_000_000) + idc * 10).alias("ts_ms"),
            source.alias("source"),
            tx.alias("transaction"),
        )

    def snapshot(self, n_rows: int) -> DataFrame:
        """Initial-snapshot READ events (op='r'), mirroring the 7-step
        relational snapshot's createDataEvents
        (RelationalSnapshotChangeEventSource.java:464-) — one 'r' envelope
        per existing row, before=null, source.snapshot='true'."""
        df = self.spark.range(n_rows)
        idc = F.col("id")
        path = self._path(idc, "a")
        source = F.struct(
            F.lit("binlog.000001").alias("file"),
            F.lit(-1).cast("long").alias("pos"),
            F.lit(None).cast("string").alias("gtid"),
            F.lit("true").alias("snapshot"),
            F.lit("inventory").alias("db"),
            F.lit("repo_files").alias("table"),
            F.lit(1_700_000_000_000).alias("ts_ms"),
        )
        return df.select(
            F.lit(None).cast(REPO_PAYLOAD_SCHEMA).alias("before"),
            self._payload(idc, path).alias("after"),
            F.lit("r").alias("op"),
            F.lit(1_700_000_000_000).alias("ts_ms"),
            source.alias("source"),
            F.lit(None).cast("struct<id:string,total_order:bigint,data_collection_order:bigint>").alias("transaction"),
        )

    def write_batches(self, out_dir: str, n_events: int, n_batches: int, start_pos: int = 0) -> list[str]:
        """Serialize the log as ordered parquet batch files (FIXTURES.md F2:
        ``batch_00000.parquet, …`` — replay order = file order)."""
        per = n_events // n_batches
        paths = []
        for b in range(n_batches):
            n = per if b < n_batches - 1 else n_events - per * (n_batches - 1)
            df = self.events(n, start_pos=start_pos + b * per)
            p = f"{out_dir}/batch_{b:05d}.parquet"
            df.write.mode("overwrite").parquet(p)
            paths.append(p)
        return paths
