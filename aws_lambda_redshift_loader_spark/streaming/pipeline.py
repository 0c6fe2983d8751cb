"""End-to-end ingestion pipeline: the engine's equivalent of the
reference's Lambda handler (§3.1), failure replay (§3.2), and the
operational CLI (§3.3).

One `IngestPipeline` instance = the whole serverless deployment:
config table + batcher per prefix + ledger + sinks + notifications.
File *events* flow through driver-side control logic (tiny, exactly like
the reference's Lambda never touching row data); file *contents* flow
through distributed `spark.read` → `fan_out` only when a batch flushes.

Event path parity (handler, index.js:1545-1648):
  event → hive-wildcard transform (P4) → longest-prefix config resolve
  (P5) → filename filter, fail-open (P2) → ledger dedup claim (J1/T6) →
  attach to open batch (A1-A3) → tri-threshold sweep (T1-T3) → on flush:
  lock+rotate (T4/T5) → manifest (S6) → read files (S3) → fan-out load
  (S4/S5) → complete/error (A5) → notify (S7).

Replay path parity (§3.2): failed batch → reprocessing → per-file ledger
unlink (previousBatches rotation) → files re-submitted through the SAME
ingest path (the reference re-fires S3 events via in-place copy;
we re-enqueue directly — no object mutation needed) → reprocessed.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..sources.reader import read_files
from ..sources.routing import LoadConfig, filename_filter, resolve_config, transform_hive_style_prefix
from .batcher import COMPLETE, ERROR, LOCKED, REPROCESSED, REPROCESSING, Batch, Batcher
from .ledger import ProcessedFilesLedger
from .sinks import NotificationLog, SinkResult, fan_out, write_manifest


@dataclass
class FileEvent:
    """inputInfo (index.js:1577-1583): one ObjectCreated record."""

    key: str  # full object key (prefix/filename)
    size: int = 0
    ts: float | None = None


@dataclass
class LoadOutcome:
    batch: Batch
    ok: bool
    results: list[SinkResult] = field(default_factory=list)
    manifest: str | None = None


class IngestPipeline:
    def __init__(
        self,
        spark: SparkSession,
        configs: list[LoadConfig],
        manifest_dir: str | None = None,
        suppress_wildcard: list[str] | None = None,
    ) -> None:
        self.spark = spark
        self.configs = {c.s3_prefix: c for c in configs}
        self.batchers = {p: Batcher(c) for p, c in self.configs.items()}
        self.ledger = ProcessedFilesLedger()
        self.notifications = NotificationLog()
        self.manifest_dir = manifest_dir
        self.suppress_wildcard = suppress_wildcard or []
        self.outcomes: list[LoadOutcome] = []

    # -- §3.1 main event path ---------------------------------------------

    def on_file_event(self, event: FileEvent) -> LoadOutcome | None:
        """The handler (index.js:1545-1648). Returns the load outcome if
        this event flushed a batch, else None."""
        now = event.ts if event.ts is not None else time.time()
        prefix = event.key.rsplit("/", 1)[0] if "/" in event.key else ""
        prefix = transform_hive_style_prefix(prefix, self.suppress_wildcard)  # P4
        config = resolve_config(prefix, self.configs)  # P5
        if config is None:
            return None  # no config → event ignored (index.js:167-169)
        batcher = self.batchers[config.s3_prefix]

        if not filename_filter(event.key, config.filename_filter_regex):  # P2
            # Filtered files still sweep the pending batch for age flushes
            # (index.js:233, README.md:653).
            flushed = batcher.sweep(now)
            return self._load(batcher, flushed) if flushed else None

        if not self.ledger.check_and_claim(event.key, now):  # J1/T6
            return None  # duplicate delivery dropped (timesReceived bumped)

        flushed = batcher.add_file(event.key, event.size, now)
        self.ledger.link(event.key, batcher.current.batch_id if flushed is None else flushed.batch_id)
        return self._load(batcher, flushed) if flushed else None

    def sweep_all(self, now: float | None = None) -> list[LoadOutcome]:
        """S9 trigger-file sweep (createS3TriggerFile.js:17-78): force the
        age check on every configured prefix — the cron analog."""
        out = []
        for batcher in self.batchers.values():
            flushed = batcher.sweep(now)
            if flushed is not None:
                out.append(self._load(batcher, flushed))
        return out

    # -- data plane --------------------------------------------------------

    def _load(self, batcher: Batcher, batch: Batch) -> LoadOutcome:
        """Locked batch → manifest → distributed read → fan-out → status.
        (loadRedshiftWithManifest index.js:878-972 + close/fail + notify)"""
        assert batch.status == LOCKED
        manifest = (
            write_manifest(batch, self.manifest_dir) if self.manifest_dir else None
        )
        cfg = batcher.config
        try:
            df = read_files(self.spark, cfg, batch.files())
            ok, results = fan_out(df, cfg.sinks)
            err = "; ".join(r.error for r in results if r.error) or None
        except Exception as exc:
            ok, results, err = False, [], str(exc)
        batcher.mark(batch, COMPLETE if ok else ERROR, err)
        self.notifications.notify(batch, ok, err)
        outcome = LoadOutcome(batch=batch, ok=ok, results=results, manifest=manifest)
        self.outcomes.append(outcome)
        return outcome

    # -- §3.2 failure replay (T9) -----------------------------------------

    def reprocess_batch(
        self, s3_prefix: str, batch_id: str, omit_files: list[str] | None = None
    ) -> list[LoadOutcome]:
        """reprocessBatch (batchOperations.js:276-375): status → reprocessing,
        per-file ledger unlink (previousBatches rotation, common.js:858-889),
        re-submit files minus omitFiles (U2 except semantics,
        batchOperations.js:312-344) through the normal ingest path, then
        status → reprocessed."""
        batcher = self.batchers[s3_prefix]
        batch = self._find_batch(batcher, batch_id)
        if batch.status not in (LOCKED, ERROR, COMPLETE):
            raise ValueError(
                f"batch {batch_id} is {batch.status}; cannot reprocess "
                "(empty/open guard, batchOperations.js:286-293)"
            )
        batcher.mark(batch, REPROCESSING)
        omit = set(omit_files or [])
        outcomes = []
        for entry in batch.entries:
            if entry.file in omit:
                continue
            self.ledger.unlink_for_reprocess(entry.file)
            out = self.on_file_event(FileEvent(key=entry.file, size=entry.size))
            if out is not None:
                outcomes.append(out)
        batcher.mark(batch, REPROCESSED)
        return outcomes

    def replay_failures(self) -> list[LoadOutcome]:
        """S8: consume failure notifications → reprocess each failed batch
        (failedBatchReprocessingLambda.js:99-152)."""
        out = []
        for n in self.notifications.failures():
            batcher = self.batchers.get(n.s3_prefix)
            if batcher is None:
                continue
            batch = self._find_batch(batcher, n.batch_id)
            if batch.status == ERROR:
                out.extend(self.reprocess_batch(n.s3_prefix, n.batch_id))
        return out

    # -- §3.3 operational queries / admin ---------------------------------

    def query_batches(
        self,
        status: str,
        start: float | None = None,
        end: float | None = None,
    ) -> list[Batch]:
        """queryBatches.js:10-29 → doQuery (batchOperations.js:101-184):
        the GSI (status, lastUpdate range) query as a filter."""
        out = []
        for b in self._all_batches():
            if b.status != status:
                continue
            if start is not None and b.last_update < start:
                continue
            if end is not None and b.last_update > end:
                continue
            out.append(b)
        out.sort(key=lambda b: b.last_update)
        return out

    def describe_batch(self, s3_prefix: str, batch_id: str) -> Batch:
        """describeBatch.js:10-28 → getBatch (batchOperations.js:60-87)."""
        return self._find_batch(self.batchers[s3_prefix], batch_id)

    def unlock_batch(self, s3_prefix: str, batch_id: str) -> Batch:
        """unlockBatch.js → common.js:790-840: locked → open escape hatch."""
        batcher = self.batchers[s3_prefix]
        batch = self._find_batch(batcher, batch_id)
        batcher.mark(batch, "open")
        batcher.history.remove(batch)
        # Merge the unlocked entries back into the current open batch.
        for e in batch.entries:
            batcher.current.entries.append(e)
        batcher.current.write_dates.extend(batch.write_dates)
        batcher.current.size += batch.size
        return batcher.current

    def reset_current_batch(self, s3_prefix: str) -> str:
        """resetCurrentBatch.js → common.js: allocate a fresh currentBatch
        id on the config when the open batch is wedged; the old open batch
        stays in history (still `open`) for unlock/delete triage. Returns
        the new batch id."""
        batcher = self.batchers[s3_prefix]
        old = batcher.current
        if old is not None and old.entries:
            batcher.history.append(old)
        batcher._rotate()
        return batcher.current.batch_id

    def delete_batches(self, status: str, dry_run: bool = True) -> list[Batch]:
        """deleteBatches.js:10-28 (dryRun gate, batchOperations.js:227-271).

        The status query can return the LIVE open batch (batcher.current),
        which is not in `history` — deleting it means rotating to a fresh
        current batch (the reference deletes the DynamoDB row and lets
        processPendingBatch lazily recreate the open batch), NOT
        history.remove(), which raised mid-loop and left a partial
        delete."""
        victims = self.query_batches(status)
        if not dry_run:
            for b in victims:
                batcher = self.batchers[b.s3_prefix]
                if b is batcher.current:
                    batcher._rotate()
                else:
                    batcher.history.remove(b)
        return victims

    def _all_batches(self) -> list[Batch]:
        return [b for batcher in self.batchers.values() for b in batcher.all_batches()]

    @staticmethod
    def _find_batch(batcher: Batcher, batch_id: str) -> Batch:
        for b in batcher.all_batches():
            if b.batch_id == batch_id:
                return b
        raise KeyError(batch_id)
