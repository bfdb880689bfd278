"""Skew planning: per-cell census → salt map → bounded partitions.

North_rule: "skewed cells (dense urban clusters) are salted and split via
explicit repartition + groupby-aggregate shuffles so no partition exceeds a
size budget". The urban hotspot in the synthetic layer (sources/synth.py
HOTSPOT, mirroring dense capture directories in the reference) concentrates
~20% of rows into a handful of coarse cells.

Census strategy at scale: counting every row would need a full extra pass over
the raw bytes, so the census reads a deterministic sample of input fragments
(every ``1/frac``-th file), parses only the header (no pixel decompress), and
scales counts up with a safety factor. Salt factor per cell
F = ceil(est_rows · safety / budget); row's salt = blake2b(image_id) % F —
stable under any batching/resume (never row position; SURVEY §7.4-2).
Join/enrichment results are row-local, so salting cannot change output rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_SAFETY = 1.3


def census_counts(files: list, cell_col: str = "h3_r5", frac: float = 0.125):
    """Light sampled census: cell → estimated row count (pandas Series)."""
    import ray.data as rd

    from ..stages.extract import assign_cells, extract_meta_light

    files = sorted(files)
    step = max(1, int(round(1.0 / frac)))
    sample = files[::step]
    scale = len(files) / len(sample)
    ds = rd.read_parquet(sample, columns=["image_id", "bytes", "w", "h"])
    ds = ds.map_batches(extract_meta_light, batch_format="pyarrow")
    ds = ds.map_batches(assign_cells, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        keys, counts = np.unique(t.column(cell_col).to_numpy(), return_counts=True)
        return pa.table({cell_col: keys, "cnt": counts.astype(np.int64)})

    small = ds.map_batches(partial, batch_format="pyarrow").groupby(cell_col).sum("cnt")
    pdf = small.to_pandas()
    return (pdf.set_index(cell_col)["sum(cnt)"] * scale).astype(np.int64)


def salt_map(counts: pd.Series, budget: int) -> dict:
    """cell → number of salt buckets (≥1)."""
    f = np.ceil(counts.to_numpy() * _SAFETY / budget).astype(np.int64)
    return {int(k): max(1, int(v)) for k, v in zip(counts.index, f)}


def _salt_hash(image_ids: np.ndarray) -> np.ndarray:
    return np.array([
        int.from_bytes(hashlib.blake2b(s.encode(), digest_size=4).digest(), "big")
        for s in image_ids
    ], dtype=np.int64)


def add_part_key(batch: pa.Table, salt_by_cell: dict, cell_col: str = "h3_r5") -> pa.Table:
    """Append `part_key` = '<cell>:<salt>' (stable hash of image_id mod F)."""
    cells = batch.column(cell_col).to_numpy()
    ids = np.asarray(batch.column("image_id").to_pylist(), dtype=object)
    factors = np.array([salt_by_cell.get(int(c), 1) for c in cells], dtype=np.int64)
    salts = np.where(factors > 1, _salt_hash(ids) % factors, 0)
    keys = np.array([f"{c}:{s}" for c, s in zip(cells, salts)], dtype=object)
    return batch.append_column("part_key", pa.array(keys.astype(str)))
