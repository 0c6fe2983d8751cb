"""Processed-file ledger: at-least-once events → exactly-once loads
(reference T6/T7/J1).

The reference dedups file deliveries with an idempotent DynamoDB upsert
probe (checkFileProcessed, index.js:247-306): the first delivery claims
the file; duplicates bump `timesReceived` (index.js:262-271) and are
dropped. After batch attach, the ledger row links to the batch
(linkProcessedFileToBatch, index.js:522-551). Reprocessing unlinks the
batch id and pushes it onto `previousBatches` (common.js:858-889) so the
file may flow through again — "seen" and "loaded by batch X" are distinct
states, which is exactly the T6-vs-T9 interplay SURVEY §7 flags.

Driver-side dict (control plane is file-grain, tiny relative to data);
persisted/queried as a DataFrame via control_tables. The set-oriented
form of the same dedup — millions of files in one pass — is the
`ledger_anti_join` query (operators.relational): new_files LEFT ANTI JOIN
ledger ON file.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class LedgerRow:
    """LambdaRedshiftProcessedFiles item (common.js:132-147)."""

    load_file: str  # HASH key: bucket/key
    receive_date_time: float = 0.0
    times_received: int = 1
    batch_id: str | None = None
    previous_batches: list[str] = field(default_factory=list)


class ProcessedFilesLedger:
    def __init__(self) -> None:
        self.rows: dict[str, LedgerRow] = {}

    def check_and_claim(self, load_file: str, now: float | None = None) -> bool:
        """checkFileProcessed (index.js:247-306): True ⇒ first delivery,
        proceed; False ⇒ duplicate, drop (timesReceived bumped)."""
        now = time.time() if now is None else now
        row = self.rows.get(load_file)
        if row is None:
            self.rows[load_file] = LedgerRow(load_file=load_file, receive_date_time=now)
            return True
        row.times_received += 1  # A4 counter (index.js:262-271)
        # Only a live batchId link makes a delivery a duplicate
        # (index.js:282-301): an unlinked row — first attach incomplete OR
        # unlinked for reprocess (common.js:858-889) — proceeds again.
        return row.batch_id is None

    def link(self, load_file: str, batch_id: str) -> None:
        """linkProcessedFileToBatch (index.js:522-551)."""
        row = self.rows.get(load_file)
        if row is not None:
            row.batch_id = batch_id

    def unlink_for_reprocess(self, load_file: str) -> None:
        """reprocessFile (common.js:842-915): batchId → previousBatches,
        clearing the claim so the replayed file passes dedup again."""
        row = self.rows.get(load_file)
        if row is not None and row.batch_id is not None:
            row.previous_batches.append(row.batch_id)
            row.batch_id = None
