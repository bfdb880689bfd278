"""Checkpoint manifest: per-partition lineage + exact resume (north_rule).

The reference's "checkpoint recovery" is re-running over output files
(README_STEP.md:30,552-554; overwrite_existing flag core/config.py:41) and its
`processing_runs` table tracks per-file status (create-tables.sql:14-63). Here
a *partition* is a deterministic group of input fragments; after a partition's
outputs are atomically committed (tmp dir + rename), one JSON line is appended
to ``manifest.jsonl``:

    {"partition_id", "input_files": [...], "row_count", "capture_count",
     "t_start", "t_end", "rows_per_sec", "status": "done",
     "parts": [{"part_key", "rows", "h3_lo", "h3_hi", "file"} ...]}

Resume = anti-join pending partitions against manifest ids and reprocess only
those; deterministic partitioning + partition-sorted writes make the result
byte-identical to a single-shot run (tested).
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, out_dir: str):
        self.path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def done_partitions(self) -> set:
        done = set()
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("status") == "done":
                        done.add(rec["partition_id"])
        return done

    def records(self) -> list:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(x) for x in f if x.strip()]

    def commit(self, partition_id: int, input_files: list, row_count: int,
               capture_count: int, t_start: float, parts: list,
               stamp: dict | None = None):
        """``stamp`` carries the audit/versioning fields (config_hash,
        engine_version — reference create-tables.sql:226-243 configuration
        versioning, :168-186 audit-log intent) so every partition row
        records exactly which code + configuration produced it."""
        t_end = time.time()
        rec = {
            "partition_id": partition_id,
            **(stamp or {}),
            "input_files": [os.path.basename(p) for p in input_files],
            "row_count": int(row_count),
            "capture_count": int(capture_count),
            "t_start": t_start,
            "t_end": t_end,
            "rows_per_sec": round(row_count / max(t_end - t_start, 1e-9), 2),
            "status": "done",
            "parts": parts,
        }
        # atomic-enough append: single write() of one line + flush/fsync
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
        return rec


def plan_partitions(files: list, n_partitions: int) -> list:
    """Deterministic split of the sorted input file list into partitions."""
    files = sorted(files)
    n_partitions = max(1, min(n_partitions, len(files)))
    out = []
    for i in range(n_partitions):
        lo = i * len(files) // n_partitions
        hi = (i + 1) * len(files) // n_partitions
        if hi > lo:
            out.append((i, files[lo:hi]))
    return out
