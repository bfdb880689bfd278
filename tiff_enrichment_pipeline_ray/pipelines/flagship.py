"""The flagship pipeline: images → enriched rows + capture products.

Ray-Data-first restatement of the reference's full run
(reference lifecycle: main.py:405-550 — detect/classify → MicaSense branch →
regular branch → summary/validation), as ONE streaming DAG per checkpoint
partition:

  read_parquet(images, pruned)
    → map_batches(extract_meta)            # decode+EXIF+stats   (stateless)
    → map_batches(georef)                  # GSD/affine          (fused)
    → map_batches(validate)                # issue columns       (fused)
    → map_batches(assign_cells)            # hex7 r5-9 + S2 + grid (fused)
    → map_batches(Enricher, concurrency=N) # PIP + elevation + kNN (actor pool)
    → drop bytes → add part_key (salted)   # skew-bounded layout
    → groupby(part_key).map_groups(write)  # partitioned parquet + lineage

  read_parquet(images)                     # capture branch (second pass,
    → map_batches(extract_meta_light)      #   header-only — no pixel decode)
    → filter micasense → select slim cols
    → groupby(capture_id).map_groups(process_capture)   # align/calib/indices
    → map_batches(assign_cells_on_captures)
    → write_parquet(captures/)

Checkpoint/resume: partitions = deterministic groups of input files; each
commits atomically then appends a manifest line (state/manifest.py). A re-run
skips done partitions and reproduces byte-identical output (partition-sorted
writes, stable salting).
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import PipelineConfig
from ..sources import synth
from ..stages import capture as capture_stage
from ..stages import enrich as enrich_stage
from ..stages.extract import (
    assign_cells,
    extract_meta,
    extract_meta_light,
    georef,
    validate,
)
from ..state.manifest import Manifest, plan_partitions
from ..state.skew import add_part_key, census_counts, salt_map

ENRICHED_DROP = ["bytes"]


def _make_part_writer(out_dir: str):
    """map_groups writer: one parquet file per salted partition, sorted by
    image_id (deterministic), atomic tmp+rename; returns a lineage row."""

    def part_writer(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("image_id").reset_index(drop=True)
        key = str(g["part_key"].iloc[0]).replace(":", "_")
        os.makedirs(out_dir, exist_ok=True)
        final = os.path.join(out_dir, f"{key}.parquet")
        tmp = final + ".tmp"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp,
                       compression="zstd")
        os.replace(tmp, final)
        cells = g["h3_r5"].to_numpy()
        return pd.DataFrame([{
            "part_key": str(g["part_key"].iloc[0]),
            "rows": len(g),
            "h3_lo": int(cells.min()) if len(cells) else -1,
            "h3_hi": int(cells.max()) if len(cells) else -1,
            "file": os.path.basename(final),
        }])

    return part_writer


def _enrich_concurrency(cfg: PipelineConfig) -> int:
    """Size the enrichment actor pool. Ray fuses the whole stateless
    map_batches chain into this stage, so the pool does ~all per-row compute:
    give it CPUs−2 (auto), leaving slots for the read and the shuffle/write.
    A pool that reserves every CPU starves those and serializes (ray_guide);
    an explicit cfg value is still clamped to half the cluster."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    if cfg.enrich_concurrency <= 0:
        return max(1, cpus - 2)
    return max(1, min(cfg.enrich_concurrency, max(1, cpus // 2)))


def enriched_dataset(files, cfg: PipelineConfig, layer_kwargs: dict):
    """Build the lazy enriched Dataset over the given input files."""
    import ray.data as rd

    ds = rd.read_parquet(files)
    ds = ds.map_batches(extract_meta, batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(georef, batch_format="pyarrow", batch_size=cfg.batch_size)
    if cfg.validate:
        ds = ds.map_batches(validate, batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(assign_cells, batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(
        enrich_stage.Enricher,
        fn_constructor_kwargs=layer_kwargs,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=_enrich_concurrency(cfg),
        num_cpus=1,
    )
    return ds.drop_columns(ENRICHED_DROP)


def capture_dataset(files, cfg: PipelineConfig):
    """Build the lazy per-capture Dataset (second pass, header-only decode)."""
    import ray.data as rd

    ds = rd.read_parquet(files)
    ds = ds.map_batches(extract_meta_light, batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(georef, batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(
        lambda t: t.filter(
            pa.compute.equal(t.column("file_class"), pa.scalar("micasense"))),
        batch_format="pyarrow")
    ds = ds.select_columns(capture_stage.CAPTURE_SHUFFLE_COLS)
    ds = ds.map_batches(capture_stage.add_capture_bucket, batch_format="pandas")
    grouped = ds.groupby("bucket").map_groups(
        capture_stage.process_bucket, batch_format="pandas")

    def cap_cells(t: pa.Table) -> pa.Table:
        from ..functions.cells import hex7_cells_multi, s2_cell

        lat = np.nan_to_num(t.column("lat").to_numpy(zero_copy_only=False), nan=0.0)
        lon = np.nan_to_num(t.column("lon").to_numpy(zero_copy_only=False), nan=0.0)
        ok = np.isfinite(t.column("lat").to_numpy(zero_copy_only=False))
        multi = hex7_cells_multi(lat, lon, (5, 7, 9))
        out = t
        for r in (5, 7, 9):
            out = out.append_column(f"h3_r{r}", pa.array(np.where(ok, multi[r], -1)))
        out = out.append_column("s2_cell", pa.array(np.where(ok, s2_cell(lat, lon, 16), -1)))
        return out

    return grouped.map_batches(cap_cells, batch_format="pyarrow")


def run_flagship(input_dir: str, out_dir: str,
                 cfg: PipelineConfig | None = None,
                 checkpoint_partitions: int = 1,
                 resume: bool = True,
                 with_captures: bool = True,
                 layers_dir: str | None = None,
                 limit_partitions: int | None = None) -> dict:
    """Run the flagship pipeline; returns a summary dict (A1 semantics:
    main.py:441-459 — totals, duration, rows/s)."""
    import glob

    cfg = cfg or PipelineConfig()
    layers_dir = layers_dir or synth.ensure_layers()
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet in {input_dir}")
    manifest = Manifest(out_dir)
    if not resume:
        for sub in ("enriched", "captures"):
            shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
        if os.path.exists(manifest.path):
            os.remove(manifest.path)
    done = manifest.done_partitions()
    partitions = plan_partitions(files, checkpoint_partitions)
    pending = [(pid, fs) for pid, fs in partitions if pid not in done]
    if limit_partitions is not None:
        pending = pending[:limit_partitions]  # simulated-kill / paced resume

    layer_kwargs = enrich_stage.put_layers(layers_dir)
    t0 = time.time()
    total_rows = 0
    total_caps = 0
    phases = {"census": 0.0, "enrich_write": 0.0, "captures": 0.0}
    for pid, part_files in pending:
        t_start = time.time()
        # --- skew plan. Bin budget: bounded above by the configured row
        # budget (north_rule size cap) and below so writes parallelize
        # (≈ 2 output bins per CPU). Parquet row counts are free metadata.
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
        est_rows = sum(pq.read_metadata(f).num_rows for f in part_files)
        bin_budget = int(min(cfg.partition_row_budget,
                             max(4096, est_rows // (2 * cpus))))
        if est_rows > bin_budget:
            counts = census_counts(part_files,
                                   cell_col=f"h3_r{cfg.cell_partition_res}")
            salts = salt_map(counts, bin_budget)
        else:
            salts = {}
        phases["census"] += time.time() - t_start
        t_ph = time.time()

        enriched = enriched_dataset(part_files, cfg, layer_kwargs)
        enriched = enriched.map_batches(
            lambda t, _s=salts: add_part_key(t, _s, f"h3_r{cfg.cell_partition_res}"),
            batch_format="pyarrow")
        part_dir = os.path.join(out_dir, "enriched", f"part={pid:05d}")
        tmp_dir = part_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)
        lineage = (enriched.groupby("part_key")
                   .map_groups(_make_part_writer(tmp_dir), batch_format="pandas")
                   .to_pandas())
        os.replace(tmp_dir, part_dir)
        rows = int(lineage["rows"].sum())
        phases["enrich_write"] += time.time() - t_ph
        t_ph = time.time()

        caps = 0
        if with_captures:
            cap_part = os.path.join(out_dir, "captures", f"part={pid:05d}")
            cap_tmp = cap_part + ".tmp"
            shutil.rmtree(cap_tmp, ignore_errors=True)
            shutil.rmtree(cap_part, ignore_errors=True)
            cds = capture_dataset(part_files, cfg)
            cds.write_parquet(cap_tmp)
            os.replace(cap_tmp, cap_part)
            import glob as _g

            caps = sum(pq.read_metadata(f).num_rows
                       for f in _g.glob(os.path.join(cap_part, "*.parquet")))
        phases["captures"] += time.time() - t_ph
        manifest.commit(pid, part_files, rows, caps, t_start,
                        lineage.to_dict("records"))
        total_rows += rows
        total_caps += caps

    dur = time.time() - t0
    recs = manifest.records()
    return {
        "partitions_total": len(partitions),
        "partitions_run": len(pending),
        "partitions_skipped": len(partitions) - len(pending),
        "rows_written": total_rows,
        "captures_written": total_caps,
        "rows_total_manifest": int(sum(r["row_count"] for r in recs)),
        "duration_sec": round(dur, 3),
        "rows_per_sec": round(total_rows / dur, 1) if dur > 0 and total_rows else 0.0,
        "phases_sec": {k: round(v, 2) for k, v in phases.items()},
        "out_dir": out_dir,
    }


def read_enriched(out_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(out_dir, "enriched"),
                           file_extensions=["parquet"])


def read_captures(out_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(out_dir, "captures"))
