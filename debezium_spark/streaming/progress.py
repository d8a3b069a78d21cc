"""Migration-progress reporting — the fork's headline 迁移进度上报 feature.

The reference commits periodic JSON progress lines to rotating files so an
external controller can read migration latency (fork ``README.md:113``
feature bullet; field tables ``README.md:339-366``). This module re-creates
that surface with the reference's exact on-disk contract:

- JSON field ORDER matches the reference serializers byte-for-byte
  (``BaseSourceProcessInfo.java:217-228``,
  ``MysqlSinkProcessInfo.java:89-102``) — one JSON object per line.
- Files rotate at ``file.size.limit`` MB under a timestamped name
  ``<prefix>yyyy-MM-dd-HH:mm:ss.txt`` (``BaseProcessCommitter.java:140-157``).
- Retention: at most ``process.file.count.limit`` files (oldest deleted
  first) and nothing older than ``process.file.time.limit`` hours
  (``deleteRedundantFiles``, ``BaseProcessCommitter.java:216-239``).
- The source side publishes its effective create count to
  ``<create.count.info.path>/start-event-index.txt`` as ``<millis>:<count>``
  and the sink side reads it to compute ``overallPipe``
  (``MysqlProcessCommitter.java:37,208-212,265``).

Counter units: the reference's MySQL pipeline counts TRANSACTIONS; this
engine's replay unit is the change event, so counters here are change
events (documented, consistent across source and sink — ratios and rest
math behave identically). The committer is driver-side control-plane code:
it never runs Spark jobs itself; the engine feeds it counts it already
has (the fused per-batch probe and the commit's own lineage rows).

Unlike the reference there is no reporter thread parked in a
``while(true) sleep`` loop (``BaseProcessCommitter.java:261-274``) — the
engine is micro-batch synchronous, so reports commit at batch boundaries,
paced to at most one line per ``commit.time.interval`` seconds; replay
and carry-flush force a terminal line so a fast run's final totals always
land, and offset-bearing heartbeats refresh the timestamp on idle-alive
streams (the liveness signal the reference's repeating loop provides).

Scope: one committer per connector process, the reference's shape —
attach to ``CdcEngine`` (single-table replay), to ``MultiTableEngine``
(one reporter for the whole multi-table sink; include-list drops surface
as ``skippedExcludeEventCount``), or to the source-side tools.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass


@dataclass
class SourceProcessInfo:
    """Source-side counters (``BaseSourceProcessInfo.java``): events
    produced by the log (``createCount``), dropped by include/exclude
    filtering (``skippedExcludeCount``), parsed into envelopes
    (``convertCount``), delivered downstream (``pollCount``)."""

    createCount: int = 0
    skippedExcludeCount: int = 0
    convertCount: int = 0
    pollCount: int = 0

    @property
    def rest(self) -> int:
        # BaseSourceProcessInfo.java:121-123
        return self.createCount - self.pollCount - self.skippedExcludeCount

    def to_json(self, timestamp_ms: int, speed: int) -> str:
        # field order = BaseSourceProcessInfo.toString (java:217-228)
        return (
            "{"
            f"\"timestamp\":{timestamp_ms}"
            f",\"createCount\":{self.createCount}"
            f",\"skippedExcludeCount\":{self.skippedExcludeCount}"
            f",\"convertCount\":{self.convertCount}"
            f",\"pollCount\":{self.pollCount}"
            f",\"speed\":{speed}"
            f",\"rest\":{self.rest}"
            "}"
        )


@dataclass
class SinkProcessInfo:
    """Sink-side counters (``MysqlSinkProcessInfo.java``). ``replayedCount``
    = attempted = ``successCount`` + ``failCount`` (the reference's
    invariant); here success = rows the fenced MERGE committed (the
    commit's own lineage), fail = rows quarantined, skipped = rows in
    fence-skipped batches (exactly-once replay skip),
    skippedExcludeEventCount = rows dropped before the merge (SMT
    include/exclude filters and last-wins collapse)."""

    extractCount: int = 0
    skippedExcludeEventCount: int = 0
    skippedCount: int = 0
    successCount: int = 0
    failCount: int = 0

    @property
    def replayedCount(self) -> int:
        return self.successCount + self.failCount

    @property
    def rest(self) -> int:
        # BaseSinkProcessInfo.java:159 — rows extracted but not yet
        # replayed. Here that is exactly the deferred open-tail
        # transaction parked for the next batch (the committer's
        # ``_parked``); a synchronous batch with no open tail reports 0.
        return (
            self.extractCount
            - self.replayedCount
            - self.skippedExcludeEventCount
            - self.skippedCount
        )

    def overall_pipe(self, source_create_count: int) -> int:
        # MysqlSinkProcessInfo.java:69-72. The source publishes PRE-split
        # event counts while the sink counts post-split records, so the
        # pipe reads conservatively low (clamping at 0 = drained) — the
        # mismatch is bounded by the batch's PK-change count.
        res = (
            source_create_count
            - self.replayedCount
            - self.skippedCount
            - self.skippedExcludeEventCount
        )
        return res if res >= 0 else 0

    def to_json(self, timestamp_ms: int, speed: int, overall_pipe: int) -> str:
        # field order = MysqlSinkProcessInfo.toString (java:89-102)
        return (
            "{"
            f"\"timestamp\":{timestamp_ms}"
            f",\"extractCount\":{self.extractCount}"
            f",\"skippedExcludeEventCount\":{self.skippedExcludeEventCount}"
            f",\"skippedCount\":{self.skippedCount}"
            f",\"replayedCount\":{self.replayedCount}"
            f",\"successCount\":{self.successCount}"
            f",\"failCount\":{self.failCount}"
            f",\"speed\":{speed}"
            f",\"rest\":{self.rest}"
            f",\"overallPipe\":{overall_pipe}"
            "}"
        )


SOURCE_PREFIX = "forward-source-process-"  # MysqlProcessCommitter.java:35
SINK_PREFIX = "forward-sink-process-"  # MysqlProcessCommitter.java:36
CREATE_COUNT_INFO_NAME = "start-event-index.txt"  # MysqlProcessCommitter.java:37


def _stamp(ts: float) -> str:
    # the reference's file-name pattern yyyy-MM-dd-HH:mm:ss
    return time.strftime("%Y-%m-%d-%H:%M:%S", time.localtime(ts))


class ProcessCommitter:
    """Rotating-file progress committer for one pipeline side.

    ``role`` picks the prefix + record shape (``source`` | ``sink``).
    Limits mirror the reference properties: ``commit_time_interval``
    seconds between lines, ``file_size_limit`` MB before rotation,
    ``file_count_limit`` files kept, ``file_time_limit`` hours kept,
    ``append_write=False`` = each report overwrites the current file
    (the reference's non-append mode keeps only the newest line)."""

    def __init__(
        self,
        process_file_path: str,
        role: str = "sink",
        *,
        commit_time_interval: int = 1,
        file_size_limit: int = 10,
        file_count_limit: int = 10,
        file_time_limit: int = 168,
        append_write: bool = True,
        create_count_info_path: str | None = None,
        prefix: str | None = None,
    ) -> None:
        if role not in ("source", "sink"):
            raise ValueError(f"unknown committer role {role!r}")
        self.role = role
        self.dir = process_file_path
        os.makedirs(self.dir, exist_ok=True)
        self.prefix = prefix or (SOURCE_PREFIX if role == "source" else SINK_PREFIX)
        self.commit_time_interval = commit_time_interval
        self.file_size_limit = file_size_limit
        self.file_count_limit = file_count_limit
        self.file_time_limit = file_time_limit
        self.append_write = append_write
        # default = own dir, matching the deploy where source and sink
        # share the progress directory; the property overrides it
        self.create_count_info_path = create_count_info_path or self.dir
        self.source = SourceProcessInfo()
        self.sink = SinkProcessInfo()
        self._current: str | None = None
        self._last_emit_ts: float | None = None
        self._last_progress = 0  # pollCount / replayedCount at last line
        #: rows extracted but deferred to a later batch (open-tail
        #: transaction carry) — drained when they finally apply; always
        #: equals the sink's ``rest``
        self._parked = 0

    # -- counter feeds (the engine calls these; no Spark work here) --------

    def record_source_batch(
        self, created: int, converted: int | None = None,
        polled: int | None = None, skipped_exclude: int = 0,
    ) -> None:
        self.source.createCount += created
        self.source.skippedExcludeCount += skipped_exclude
        self.source.convertCount += converted if converted is not None else created
        self.source.pollCount += polled if polled is not None else created
        self._maybe_commit()

    def record_sink_batch(
        self, extracted: int, success: int, failed: int = 0,
        skipped: int = 0, deferred: int = 0, drained_carry: bool = False,
    ) -> None:
        """One replayed (or skipped) batch. ``extracted`` rows arrived;
        ``success`` reached the table (the commit's lineage events),
        ``failed`` were quarantined, ``skipped`` were behind the fence,
        ``deferred`` were carried to the next batch as an open-tail
        transaction (the replay loop's fused probe knows the tail group's
        row count, so parking is EXACT — review r5: inferring it from the
        residual confounded parked rows with genuine exclude drops).

        Parked rows stay in ``extractCount`` and nowhere else, so the
        reference's ``rest`` formula reports them as in-the-pipe — its
        exact meaning. ``drained_carry=True`` says this batch consumed the
        WHOLE parked pool as carried-in input (the replay loop prepends
        the entire persisted carry to the next closed batch), which makes
        the attribution exact: residual counts over ``extracted +
        carried_in``, a positive residual is exclude-filtering/last-wins
        collapse, a negative one is PK-change delete+create expansion
        (the reference's SOURCE emits those pre-split, so its extract
        counter sees both records) and ``extractCount`` adjusts to the
        post-split count. Deriving the drain from a negative residual
        alone — the pre-r5-final behavior, kept as the fallback for
        callers without carry knowledge — confounds the two when one
        batch both drains a carry AND collapses events: the parked pool
        stays inflated and the collapse never reaches
        ``skippedExcludeEventCount`` (final review r5)."""
        carried_in = 0
        if drained_carry:
            carried_in = self._parked
            self._parked = 0
        self._parked += deferred
        residual = extracted + carried_in - success - failed - skipped - deferred
        if residual >= 0:
            self.sink.skippedExcludeEventCount += residual
        else:
            need = -residual
            if not drained_carry:
                take = min(self._parked, need)
                self._parked -= take
                need -= take
            extracted += need
        self.sink.extractCount += extracted
        self.sink.successCount += success
        self.sink.failCount += failed
        self.sink.skippedCount += skipped
        self._maybe_commit()

    def record_sink_flush(self, success: int, failed: int = 0) -> None:
        """Settle a deferred-transaction flush: the parked rows apply now.
        Pure delegation — flush is a batch that extracts nothing new and
        drains the carry, so the drain logic lives in ONE place (review
        r5 duplication)."""
        self.record_sink_batch(
            extracted=0, success=success, failed=failed, drained_carry=True
        )

    # -- the reference's file mechanics ------------------------------------

    def commit(self, force: bool = False) -> str | None:
        """Write one progress line (rotating/retiring files per the
        limits); paced to ``commit_time_interval`` unless ``force``.
        Returns the line written, or None when paced out."""
        now = time.time()
        if (
            not force
            and self._last_emit_ts is not None
            and now - self._last_emit_ts < self.commit_time_interval
        ):
            return None
        interval = (
            max(now - self._last_emit_ts, 1e-9)
            if self._last_emit_ts is not None
            else None
        )
        if self.role == "source":
            progress = self.source.pollCount
        else:
            progress = self.sink.replayedCount
        # setSpeed(before, timeInterval): progress delta per second; the
        # first line has no prior sample so speed starts at 0 like the
        # reference's freshly-constructed info object
        speed = (
            int((progress - self._last_progress) / interval) if interval else 0
        )
        ts_ms = int(now * 1000)
        if self.role == "source":
            line = self.source.to_json(ts_ms, speed)
            # publish the effective create count for the sink's overallPipe
            # (MysqlProcessCommitter.java:265: create - skippedExclude)
            self._output_create_count(
                self.source.createCount - self.source.skippedExcludeCount,
                ts_ms,
            )
        else:
            line = self.sink.to_json(
                ts_ms, speed, self.sink.overall_pipe(self._input_create_count())
            )
        self._write_line(line, now)
        self._retire_files(now)
        self._last_emit_ts = now
        self._last_progress = progress
        return line

    def _maybe_commit(self) -> None:
        self.commit(force=False)

    def current_file(self) -> str | None:
        return self._current

    def _write_line(self, line: str, now: float) -> None:
        size_cap = self.file_size_limit * 1024 * 1024
        if self._current is None or (
            self.append_write
            and os.path.exists(self._current)
            and os.path.getsize(self._current) > size_cap
        ):
            # the timestamped name has second resolution; a second rotation
            # within the same second must NOT resolve back to the full file
            # (review r5: the size cap was unenforced for that second) — a
            # dotted sequence disambiguates while keeping the prefix scan
            base = os.path.join(self.dir, f"{self.prefix}{_stamp(now)}")
            cand, n = f"{base}.txt", 0
            while cand == self._current or os.path.exists(cand):
                n += 1
                cand = f"{base}.{n}.txt"
            self._current = cand
        mode = "a" if self.append_write else "w"
        with open(self._current, mode) as f:
            f.write(line + "\n")

    def _retire_files(self, now: float) -> None:
        files = [
            os.path.join(self.dir, fn)
            for fn in os.listdir(self.dir)
            if fn.startswith(self.prefix)
        ]
        # count limit: keep at most file_count_limit files, oldest deleted
        # first (the reference prunes to limit-1 because its sweep runs
        # BEFORE the next rotation; ours runs after the write, so pruning
        # to the limit itself honors the documented retention exactly —
        # review r5 off-by-one finding)
        files.sort(key=os.path.getmtime)
        while len(files) > self.file_count_limit and len(files) > 1:
            victim = files.pop(0)
            if victim == self._current:
                break  # never delete the live file
            os.unlink(victim)
        cutoff = now - self.file_time_limit * 3600
        for path in files:
            if path != self._current and os.path.getmtime(path) < cutoff:
                os.unlink(path)

    def _output_create_count(self, count: int, ts_ms: int) -> None:
        path = os.path.join(self.create_count_info_path, CREATE_COUNT_INFO_NAME)
        os.makedirs(self.create_count_info_path, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{ts_ms}:{count}")
        os.replace(tmp, path)  # reference overwrites; we do it atomically

    def _input_create_count(self) -> int:
        """Sink side: read the source's published count; absent/garbled →
        overallPipe degrades to 0 (``BaseProcessCommitter.java:175-207``
        returns -1 and the setter clamps)."""
        path = os.path.join(self.create_count_info_path, CREATE_COUNT_INFO_NAME)
        try:
            with open(path) as f:
                parts = f.read().strip().split(":")
            return int(parts[1]) if len(parts) >= 2 and parts[1] else 0
        except (OSError, ValueError):
            return 0


__all__ = [
    "CREATE_COUNT_INFO_NAME",
    "ProcessCommitter",
    "SinkProcessInfo",
    "SourceProcessInfo",
    "SOURCE_PREFIX",
    "SINK_PREFIX",
]
