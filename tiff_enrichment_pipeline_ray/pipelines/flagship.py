"""The flagship pipeline: images → enriched rows + capture products.

Ray-Data-first restatement of the reference's full run
(reference lifecycle: main.py:405-550 — detect/classify → MicaSense branch →
regular branch → summary/validation), as ONE streaming DAG per checkpoint
partition:

  read_parquet(images, pruned)
    → map_batches(extract_meta)            # decode+EXIF+stats   ┐ ONE fused
    → map_batches(georef)                  # GSD/affine          │ task per
    → map_batches(validate)                # issue columns       │ block,
    → map_batches(assign_cells)            # hex7 r5-9 + S2 + grid │ elastic
    → map_batches(enrich_batch_cached)     # PIP + elev + kNN    │ across all
    → map_batches(capture_split_stage)     # complete-in-block   │ CPUs
      #  captures: align/calibrate/8 indices computed + written  │ (worker-
      #  HERE (no shuffle); orphan rows spilled; bytes dropped   ┘  cached
      #                                                             indexes)
    → add part_key (salted range bins)     # skew-bounded layout
    → groupby(part_key).map_groups(write)  # partitioned parquet + lineage

  read_parquet(orphan spill, tiny)         # block-boundary + incomplete sets
    → groupby(capture bucket).map_groups(process_bucket) → captures/

(The `Enricher` actor-pool variant of the enrichment stage is selectable via
PipelineConfig.enrich_actor_pool — identical results, used when state must
pin accelerators; the default cached-task form fuses the entire per-row chain
into one task stage. The skew census runs first as a sampled header-only
pass.)

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
from ..functions import codec
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
from ..state.schemas import CAPTURE_TYPES, ENRICHED_TYPES, pin_from_pandas
from ..state.skew import add_part_key, census_counts, salt_map

ENRICHED_DROP = ["bytes"]


def _make_part_writer(out_dir: str, caps_dir: str | None = None,
                      fail_dir: str | None = None,
                      ndvi_variant: str = "processor"):
    """map_groups writer for the single shuffle. Enriched partitions
    ('<bin>[:salt]' keys): one parquet file per salted partition, sorted by
    image_id (deterministic), atomic tmp+rename. Orphan-capture partitions
    ('o:<bucket>' keys — duplicated rows carrying orph_bytes): run the
    per-capture kernel and write into ``caps_dir`` instead. Both return a
    lineage row (kind column).

    When ``fail_dir`` is set, unreadable rows (decode_ok=False) are routed to
    a quarantine partition there instead of the enriched output — the
    reference's failed-directory behavior (main.py:244-251,
    tests/test_integration.py:160-163) as a partitioned parquet tree."""

    def part_writer(g: pd.DataFrame) -> pd.DataFrame:
        key_raw = str(g["part_key"].iloc[0])
        key = key_raw.replace(":", "_")
        if key_raw.startswith("o:") and caps_dir is not None:
            cg = g.rename(columns={"orph_bytes": "bytes"})
            res = capture_stage.process_bucket(cg, ndvi_variant=ndvi_variant)
            res_t = _cap_cells(pin_from_pandas(res, CAPTURE_TYPES))
            os.makedirs(caps_dir, exist_ok=True)
            final = os.path.join(caps_dir, f"{key}.parquet")
            pq.write_table(res_t, final + ".tmp", compression="zstd")
            os.replace(final + ".tmp", final)
            cells = g["h3_r5"].to_numpy()
            return pd.DataFrame([{
                "part_key": key_raw, "kind": "captures", "rows": len(res),
                "h3_lo": int(cells.min()) if len(cells) else -1,
                "h3_hi": int(cells.max()) if len(cells) else -1,
                "file": os.path.basename(final),
            }])
        g = g.sort_values("image_id").reset_index(drop=True)
        if "orph_bytes" in g.columns:
            g = g.drop(columns=["orph_bytes"])
        lineage_rows = []
        if fail_dir is not None:
            bad = g[~g["decode_ok"]]
            if len(bad):
                os.makedirs(fail_dir, exist_ok=True)
                ffinal = os.path.join(fail_dir, f"{key}.parquet")
                pq.write_table(pin_from_pandas(bad.reset_index(drop=True),
                                               ENRICHED_TYPES),
                               ffinal + ".tmp", compression="zstd")
                os.replace(ffinal + ".tmp", ffinal)
                lineage_rows.append({
                    "part_key": key_raw, "kind": "failed", "rows": len(bad),
                    "h3_lo": -1, "h3_hi": -1,
                    "file": os.path.basename(ffinal),
                })
            g = g[g["decode_ok"]].reset_index(drop=True)
        os.makedirs(out_dir, exist_ok=True)
        final = os.path.join(out_dir, f"{key}.parquet")
        tmp = final + ".tmp"
        # pinned schema: every fragment carries identical column types even
        # when a group's column is all-null (state/schemas.py)
        pq.write_table(pin_from_pandas(g, ENRICHED_TYPES), tmp,
                       compression="zstd")
        os.replace(tmp, final)
        cells = g["h3_r5"].to_numpy()
        lineage_rows.append({
            "part_key": key_raw, "kind": "enriched", "rows": len(g),
            "h3_lo": int(cells.min()) if len(cells) else -1,
            "h3_hi": int(cells.max()) if len(cells) else -1,
            "file": os.path.basename(final),
        })
        return pd.DataFrame(lineage_rows)

    return part_writer


_LINEAGE_COLS = {"part_key": str, "kind": str, "rows": np.int64,
                 "h3_lo": np.int64, "h3_hi": np.int64, "file": str}


def _make_block_writer(out_dir: str, caps_dir: str | None = None,
                       fail_dir: str | None = None,
                       ndvi_variant: str = "processor"):
    """Block-wise form of the partition writer, used after a HASH exchange
    (`repartition(keys=["part_key"], sort=False)`): the hash shuffle
    co-locates every row of a key in one block, so grouping inside the
    block replaces the global sort the groupby().map_groups shuffle would
    perform — the sort's sample pass and serial-ish merge were the largest
    non-scaling term of the pipeline tail (measured at sf0.4/16 CPUs: ~40 s
    after the map chain drained). Output files are byte-identical to the
    map_groups path: the per-group writer itself sorts by image_id."""
    part_writer = _make_part_writer(out_dir, caps_dir=caps_dir,
                                    fail_dir=fail_dir,
                                    ndvi_variant=ndvi_variant)

    def block_writer(df: pd.DataFrame) -> pd.DataFrame:
        outs = [part_writer(g.reset_index(drop=True))
                for _, g in df.groupby("part_key", sort=True)]
        if not outs:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in _LINEAGE_COLS.items()})
        return pd.concat(outs, ignore_index=True)

    return block_writer


def tune_data_context():
    """Raise the streaming executor's object-store budget to what the node
    actually has: the default conservative cap throttles read/map concurrency
    to a handful of tasks on wide binary rows (measured 2-3× on the read).
    Safe: the budget only gates task launches; blocks still spill if the
    store fills."""
    import ray
    from ray.data import DataContext, ExecutionResources

    ctx = DataContext.get_current()
    try:
        total = ray.cluster_resources().get("object_store_memory")
        if total:
            ctx.execution_options.resource_limits = ExecutionResources(
                object_store_memory=float(total) * 0.8)
    except Exception:
        pass
    # per-operator resource reservation guarantees each op a fixed slice of
    # the cluster; with one dominant fused task stage that caps it at ~60%
    # utilization (measured 2.4×). Our DAGs are task-only chains + one
    # shuffle, so the anti-starvation reservation isn't needed.
    if hasattr(ctx, "op_resource_reservation_enabled"):
        ctx.op_resource_reservation_enabled = False
    return ctx


def _enrich_concurrency(cfg: PipelineConfig) -> int:
    """Size the enrichment actor pool. Ray fuses the whole stateless
    map_batches chain into this stage, so the pool does ~all per-row compute:
    give it CPUs−2 (auto), leaving slots for the read and the shuffle/write.
    A pool that reserves every CPU starves those and serializes (ray_guide);
    an explicit cfg value is still clamped to half the cluster."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    if cfg.enrich_concurrency <= 0:
        # captures are processed in the TASK stage downstream of this pool
        # (fused single pass): split the node between the pool (decode/
        # enrich) and the tasks (capture align/indices + partitioned write)
        return max(1, cpus // 2)
    return max(1, min(cfg.enrich_concurrency, max(1, cpus // 2)))


def _fused_read(files, rows_per_block: int, cpus: int, est_rows: int):
    """Read the images parquet INSIDE the map-chain tasks instead of as a
    separate ReadParquet operator.

    Why: the payload column makes the input ~14× wider than the enriched
    output (sf0.1: 7.0 GB of blobs → 0.55 GB of slim rows). A ReadParquet
    operator hands its output to the fused map chain THROUGH THE OBJECT
    STORE, so every blob is serialized + deserialized once before the one
    stage that consumes it (measured: 32 pyarrow reads = 11.3 s wall at 32
    CPUs; the same reads returned through the object store = 44.2 s). Here
    the parallelism unit is a (file, row_group) fragment carried as a tiny
    item row; the fragment is read, sliced to ``rows_per_block`` and fed to
    the downstream (fused) stages inside ONE task, so bytes never transit
    the object store — only post-decode slim rows do. On a multi-node
    cluster the same holds: each task reads its fragment straight from
    shared storage; the network carries enriched rows, not payloads.

    Falls back to plain ``read_parquet`` if fragment metadata is unreadable
    (non-parquet inputs in tests).
    """
    import ray.data as rd

    try:
        items = []
        for f in files:
            md = pq.read_metadata(f)
            for rg in range(md.num_row_groups):
                items.append({"path": f, "rg": rg})
    except Exception:
        nblocks = max(4 * cpus, est_rows // rows_per_block)
        return rd.read_parquet(files, override_num_blocks=nblocks)
    if not items:
        return rd.read_parquet(files)

    def read_fragments(batch: pa.Table):
        for path, rg in zip(batch.column("path").to_pylist(),
                            batch.column("rg").to_pylist()):
            t = pq.ParquetFile(path).read_row_group(rg)
            for s in range(0, t.num_rows, rows_per_block):
                yield t.slice(s, min(rows_per_block, t.num_rows - s))

    items_ds = rd.from_items(items, override_num_blocks=len(items))
    return items_ds.map_batches(read_fragments, batch_format="pyarrow",
                                batch_size=None)


def enriched_dataset(files, cfg: PipelineConfig, layer_kwargs: dict,
                     caps_dir: str | None = None,
                     actor_pool: bool | None = None,
                     orph_dir: str | None = None):
    """Build the lazy enriched Dataset over the given input files (full
    schema: metadata + georef + cells + enrichment + pixel stats +
    validation). When ``caps_dir`` is given, complete-in-block captures are
    processed and written as a side effect of the single decode stage and
    orphan rows are spilled to ``orphan_dir`` (see
    _make_decode_stats_capture_stage).

    Enrichment state (STRtree, kNN buckets, elevation grid) is broadcast via
    ``ray.put`` and built once per worker. Two equivalent executions:
    - default: cached-task stage (`enrich_batch_cached`) — fuses with the
      whole stateless chain into one task per block, elastic across all CPUs;
    - ``actor_pool=True`` (or cfg.enrich_actor_pool): explicit
      ``map_batches(Enricher, concurrency=N)`` pool — the shape to use when
      the state must pin accelerators or serve long-lived connections.
    Results are identical (tested)."""
    import ray
    import ray.data as rd

    if actor_pool is None:
        actor_pool = cfg.enrich_actor_pool
    # block sizing: ~4k rows per block (data-sized, cluster-independent),
    # floored at 4 blocks/CPU for small inputs. Over-splitting makes the
    # part_key shuffle pay O(blocks × partitions) object fetches (measured
    # 43→30 s at 500k rows); huge blocks make the decode stage hold too many
    # decoded pixels per task.
    cpus = int(ray.cluster_resources().get("CPU", 8))
    try:
        est_rows = sum(pq.read_metadata(f).num_rows for f in files)
    except Exception:
        est_rows = 0
    # ~2048 rows/block measured fastest at sf0.4/16 CPUs (141 s vs 163 s at
    # 4096 and 150 s at 1024): smaller decode tasks bound straggler length
    # and per-task heap (the task holds the block's decoded pixels), and the
    # post-map coalesce keeps the shuffle width independent of this choice.
    rows_per_block = int(os.environ.get("GRAFT_MAP_ROWS_PER_BLOCK", "2048"))
    ds = _fused_read(files, rows_per_block, cpus, est_rows)
    ds = ds.map_batches(extract_meta_light, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(georef, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(assign_cells, batch_format="pyarrow", batch_size=None)
    if actor_pool:
        ds = ds.map_batches(
            enrich_stage.Enricher,
            fn_constructor_kwargs=layer_kwargs,
            batch_format="pyarrow",
            batch_size=None,
            concurrency=_enrich_concurrency(cfg),
            num_cpus=1,
        )
    else:
        ds = ds.map_batches(
            enrich_stage.enrich_batch_cached,
            fn_kwargs=layer_kwargs,
            batch_format="pyarrow",
            batch_size=None,
        )
    # the ONE pixel-decode stage (stats + in-block captures), then the
    # validators that depend on the decoded stats
    ds = ds.map_batches(
        _make_decode_stats_capture_stage(caps_dir, orph_dir,
                                         ndvi_variant=cfg.ndvi_variant),
        batch_format="pyarrow", batch_size=None)
    if cfg.validate:
        ds = ds.map_batches(validate, batch_format="pyarrow", batch_size=None)
    return ds


def _percentiles_25_50_75(px: np.ndarray) -> tuple:
    """(p25, p50, p75) of a 1-D/2-D integer pixel array, bit-exact with
    ``np.percentile(px.astype(float64), (25, 50, 75))`` (linear method) but
    ~1.5× faster: one np.partition over the uint16 data at the six needed
    order statistics (no float64 image copy, no per-quantile dispatch),
    then numpy's exact _lerp branch (t<0.5: a+(b-a)t, else b-(b-a)(1-t))."""
    flat = px.ravel()
    n = flat.size
    vis = (0.25 * (n - 1), 0.5 * (n - 1), 0.75 * (n - 1))
    ks = sorted({int(v) for v in vis} | {min(int(v) + 1, n - 1) for v in vis})
    part = np.partition(flat, ks)
    out = []
    for vi in vis:
        lo = int(vi)
        hi = min(lo + 1, n - 1)
        a = float(part[lo])
        b = float(part[hi])
        t = vi - lo
        out.append((a + (b - a) * t) if t < 0.5 else (b - (b - a) * (1 - t)))
    return tuple(out)


def _make_decode_stats_capture_stage(caps_dir: str | None,
                                     orph_dir: str | None = None,
                                     ndvi_variant: str = "processor"):
    """The ONE pixel-decode stage of the main pass. Per block:

    - decode every row's payload once → per-image stats columns
      (min/max/mean/std/zero-ratio — A4 semantics, rasterio_utils.py:257-296
      with exact merge) and the payload-level ``decode_ok``;
    - complete-in-block captures: align/calibrate/index them HERE from the
      already-decoded pixels and write the capture rows as side-effect
      parquet (content-hash named → idempotent under task retry; no shuffle);
    - orphan micasense rows (block-boundary / incomplete): SPILLED to
      ``orph_dir`` as slim capture-column parquet (content-hash named,
      idempotent) and resolved AFTER the main pass by a second tiny
      exchange over ~2% of the data (_resolve_orphans). Earlier they rode
      the main part_key shuffle as duplicate rows carrying ``orph_bytes``;
      sort-range partitioning put every ``o:*`` key (2% of rows but ~25%
      of shuffle BYTES) into ONE reduce partition — measured at sf0.4/16
      CPUs as a 690 MB block, an 8.5 s reduce straggler and a 2.8 s
      writer straggler. The spill keeps payload bytes out of the
      all-to-all entirely (SURVEY §7.4-3);
    - return the block without ``bytes``.

    With caps_dir=None the capture branch is skipped (stats only)."""

    def decode_stage(t: pa.Table) -> pa.Table:
        import hashlib as _h

        blobs = t.column("bytes").to_pylist()
        hdr_ok = t.column("decode_ok").to_numpy(zero_copy_only=False)
        n = len(blobs)
        decode_ok = np.zeros(n, dtype=bool)
        px_min = np.zeros(n, dtype=np.int32)
        px_max = np.zeros(n, dtype=np.int32)
        px_mean = np.full(n, np.nan)
        px_std = np.full(n, np.nan)
        zero_ratio = np.full(n, np.nan)
        px_p25 = np.full(n, np.nan)
        px_p50 = np.full(n, np.nan)
        px_p75 = np.full(n, np.nan)
        phash_ok = np.zeros(n, dtype=bool)
        stored_ph = t.column("phash").to_numpy(zero_copy_only=False)
        fmts = t.column("fmt").to_pylist()
        pixels = [None] * n
        import hashlib as _hh

        for i, blob in enumerate(blobs):
            if not hdr_ok[i]:
                continue
            px = codec.decode_pixels_only(blob)
            if px is None:
                continue
            decode_ok[i] = True
            pixels[i] = px
            px_min[i] = int(px.min())
            px_max[i] = int(px.max())
            # dtype=float64 accumulation on the uint16 array is bit-identical
            # to .astype(float64).mean()/.std() (same pairwise reduction over
            # the same promoted values, tested) and skips the full-image copy
            px_mean[i] = float(px.mean(dtype=np.float64))
            px_std[i] = float(px.std(dtype=np.float64))
            zero_ratio[i] = float((px == 0).mean())
            # A4 percentiles (rasterio_utils.py:282-292 — np.percentile
            # [25,50,75] over the band's pixels, linear interpolation);
            # single-partition fast path, bit-exact vs np.percentile (tested)
            px_p25[i], px_p50[i], px_p75[i] = _percentiles_25_50_75(px)
            # V4 integrity (rasterio_utils.py:118-155): verify the stored
            # phash against the decoded pixels (lossless formats only —
            # lossyq legitimately reconstructs different bits)
            if fmts[i] in ("raw", "png"):
                hsh = _hh.blake2b(np.ascontiguousarray(px, "<u2").tobytes(),
                                  digest_size=8).digest()
                phash_ok[i] = (int.from_bytes(hsh, "big") >> 1) == stored_ph[i]
            else:
                phash_ok[i] = True

        out = t.set_column(t.schema.get_field_index("decode_ok"), "decode_ok",
                           pa.array(decode_ok))
        for name, arr in (("px_min", px_min), ("px_max", px_max),
                          ("px_mean", px_mean), ("px_std", px_std),
                          ("zero_ratio", zero_ratio), ("phash_ok", phash_ok),
                          ("px_p25", px_p25), ("px_p50", px_p50),
                          ("px_p75", px_p75)):
            out = out.append_column(name, pa.array(arr))

        orph_global = np.empty(0, dtype=np.int64)
        if caps_dir is not None:
            import pyarrow.compute as pc

            mask = pc.and_(
                pc.equal(t.column("file_class"), pa.scalar("micasense")),
                pc.not_equal(t.column("capture_id"), pa.scalar("")))
            midx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
            if len(midx):
                mica = t.select(capture_stage.CAPTURE_SHUFFLE_COLS) \
                    .take(pa.array(midx)).to_pandas()
                mica["_px"] = [pixels[i] for i in midx]
                done, orphans = capture_stage.split_local_complete(mica)
                if len(done):
                    res = capture_stage.process_bucket(
                        done, ndvi_variant=ndvi_variant)
                    res_t = _cap_cells(pin_from_pandas(res, CAPTURE_TYPES))
                    tag = _h.blake2b("|".join(sorted(res["capture_id"])).encode(),
                                     digest_size=10).hexdigest()
                    os.makedirs(caps_dir, exist_ok=True)
                    final = os.path.join(caps_dir, f"local-{tag}.parquet")
                    pq.write_table(res_t, final + ".tmp", compression="zstd")
                    os.replace(final + ".tmp", final)
                if len(orphans):
                    orph_global = midx[orphans.index.to_numpy()]

        if len(orph_global) and orph_dir is not None:
            sel = out.select(ORPHAN_SPILL_COLS).take(pa.array(orph_global))
            # bytes → orph_bytes so the partition writer's orphan branch
            # (rename + process_bucket) applies unchanged downstream
            sel = sel.rename_columns(
                ["orph_bytes" if c == "bytes" else c
                 for c in sel.schema.names])
            ids = sorted(sel.column("image_id").to_pylist())
            tag = _h.blake2b("|".join(ids).encode(),
                             digest_size=10).hexdigest()
            os.makedirs(orph_dir, exist_ok=True)
            final = os.path.join(orph_dir, f"orph-{tag}.parquet")
            pq.write_table(sel, final + ".tmp", compression="zstd")
            os.replace(final + ".tmp", final)
        return out.drop_columns(ENRICHED_DROP)

    return decode_stage


# slim columns spilled for orphan (block-boundary) captures: what the
# capture kernel consumes + h3_r5 for the lineage record
ORPHAN_SPILL_COLS = capture_stage.CAPTURE_SHUFFLE_COLS + ["h3_r5"]


def _add_orphan_key(t: pa.Table, orphan_buckets: int = 16) -> pa.Table:
    """'o:<bucket>' part_key for spilled orphan rows — the same stable
    capture_id hash the main-shuffle orphan path used before the spill
    redesign. The capture ROW SET is identical to the pre-spill layout;
    file bucketing is volume-scaled (the caller passes total//256 buckets,
    16..4096), so o_*.parquet names/groupings differ from the fixed-16 era
    once orphans exceed ~4k rows. Run-to-run determinism holds: the bucket
    count derives only from the input row total."""
    from ..state.skew import _salt_hash

    cids = np.asarray(t.column("capture_id").to_pylist(), dtype=object)
    buckets = _salt_hash(cids) % orphan_buckets
    keys = np.array([f"o:{b}" for b in buckets], dtype=object)
    return t.append_column("part_key", pa.array(keys.astype(str)))


def assert_worker_reachable(path: str) -> None:
    """Enforce the multi-node storage contract (PipelineConfig
    .side_channel_dir): every path worker tasks write through
    (out_dir trees, the orphan spill) must be on storage visible to
    every node. Probe = driver writes a token file, a SPREAD-scheduled
    Ray task must read it back. Trivially true single-node; on a real
    cluster it fails fast (before any data is written) when out_dir is a
    node-local path."""
    import uuid

    import ray as _ray

    os.makedirs(path, exist_ok=True)
    token = uuid.uuid4().hex
    probe = os.path.join(path, f".reach_probe_{token}")
    with open(probe, "w") as f:
        f.write(token)

    @_ray.remote(num_cpus=0)
    def _read(p):
        try:
            with open(p) as f:
                return f.read()
        except OSError:
            return None

    try:
        seen = _ray.get(_read.options(
            scheduling_strategy="SPREAD").remote(probe))
        if seen != token:
            raise RuntimeError(
                f"storage contract violation: {path!r} is not visible from "
                f"worker tasks — out_dir/side_channel_dir must be shared "
                f"storage on a multi-node cluster")
    finally:
        try:
            os.remove(probe)
        except OSError:
            pass


def _resolve_orphans(orph_tmp: str, tmp_dir: str, cap_tmp: str,
                     ndvi_variant: str = "processor"):
    """Second (tiny) exchange: spilled orphan rows → capture parquet.

    Reads the per-task spill files (~2% of input rows), co-locates each
    capture's bands by the bucketed part_key and runs the same partition
    writer the main shuffle used to run for 'o:*' groups. Returns the
    lineage DataFrame (kind='captures'), empty if there were no orphans.
    Scale: the exchange carries only orphan payloads — bounded by the
    capture-set boundary-straddle rate, not the corpus."""
    import glob as _g

    import ray.data as rd

    orph_files = sorted(_g.glob(os.path.join(orph_tmp, "*.parquet")))
    if not orph_files:
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in _LINEAGE_COLS.items()})
    # bucket count scales with orphan volume (deterministic: derived from
    # row counts): the capture kernel (align + calibrate + 8 indices) is
    # the cost, so ~256 rows (~50 captures) per bucket keeps every core
    # busy — 16 fixed buckets measured 11.1 s of 16-way-parallel tail at
    # sf0.4/16 CPUs
    total = sum(pq.read_metadata(f).num_rows for f in orph_files)
    buckets = int(min(4096, max(16, total // 256)))
    # coalesce the read: one spill file per decode task means hundreds of
    # tiny blocks, and the groupby shuffle pays O(blocks × buckets) object
    # fetches (measured 21 s vs 3 s at sf0.4/16 CPUs)
    nblocks = int(min(len(orph_files), max(8, buckets // 4)))
    ods = rd.read_parquet(orph_files, override_num_blocks=nblocks)
    ods = ods.map_batches(
        lambda t, _b=buckets: _add_orphan_key(t, orphan_buckets=_b),
        batch_format="pyarrow", batch_size=None)
    if os.environ.get("GRAFT_TAIL", "sort") == "hash":
        grouped = ods.repartition(num_blocks=buckets, keys=["part_key"],
                                  sort=False).map_batches(
            _make_block_writer(tmp_dir, caps_dir=cap_tmp,
                               ndvi_variant=ndvi_variant),
            batch_format="pandas", batch_size=None)
    else:
        grouped = ods.groupby("part_key").map_groups(
            _make_part_writer(tmp_dir, caps_dir=cap_tmp,
                              ndvi_variant=ndvi_variant),
            batch_format="pandas")
    return grouped.to_pandas()


def _cap_cells(t: pa.Table) -> pa.Table:
    from ..functions.cells import hex7_cells_multi, s2_cell

    # robust to all-null blocks (arrow `null` type → object array of Nones)
    lat_raw = pd.to_numeric(t.column("lat").to_pandas(), errors="coerce") \
        .to_numpy(dtype=np.float64)
    lon_raw = pd.to_numeric(t.column("lon").to_pandas(), errors="coerce") \
        .to_numpy(dtype=np.float64)
    lat = np.nan_to_num(lat_raw, nan=0.0)
    lon = np.nan_to_num(lon_raw, nan=0.0)
    ok = np.isfinite(lat_raw)
    multi = hex7_cells_multi(lat, lon, (5, 7, 9))
    out = t
    for r in (5, 7, 9):
        out = out.append_column(f"h3_r{r}", pa.array(np.where(ok, multi[r], -1)))
    out = out.append_column("s2_cell", pa.array(np.where(ok, s2_cell(lat, lon, 16), -1)))
    return out


def capture_dataset(files, cfg: PipelineConfig):
    """Lazy full-shuffle variant (kept for API completeness/tests)."""
    import ray.data as rd

    ds = rd.read_parquet(files)
    ds = ds.map_batches(extract_meta_light, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(georef, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(
        lambda t: t.filter(
            pa.compute.equal(t.column("file_class"), pa.scalar("micasense"))),
        batch_format="pyarrow")
    ds = ds.select_columns(capture_stage.CAPTURE_SHUFFLE_COLS)
    ds = ds.map_batches(capture_stage.add_capture_bucket, batch_format="pandas")
    grouped = ds.groupby("bucket").map_groups(
        capture_stage.process_bucket, batch_format="pandas")
    return grouped.map_batches(_cap_cells, batch_format="pyarrow")


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
    tune_data_context()
    layers_dir = layers_dir or synth.ensure_layers()
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet in {input_dir}")
    # the GRAFT_TAIL=hash variant's key-based repartition requires the
    # hash shuffle strategy; Datasets capture the context at CREATION time,
    # so flip it for the whole run and restore on exit. The default sort
    # tail must NOT run under HASH_SHUFFLE: it silently switches groupby to
    # CPU-reserving hash aggregators (observed: deadlocks a 4-CPU session).
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    _ctx = DataContext.get_current()
    _prev_strategy = _ctx.shuffle_strategy
    _prev_agg_cpus = _ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
    if os.environ.get("GRAFT_TAIL", "sort") == "hash":
        _ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # aggregator actors must reserve ZERO logical CPUs or they starve
        # the map tasks on small sessions (observed: a 4-CPU run sat 97%
        # idle for 30 min — the same livelock _dsjoin dodges with
        # aggregator_ray_remote_args={"num_cpus": 0}); their combine work
        # is bounded by the shuffle's memory backpressure, not CPU slots
        _ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.0
    try:
        return _run_flagship_inner(
            input_dir, out_dir, cfg, checkpoint_partitions, resume,
            with_captures, layers_dir, limit_partitions, files)
    finally:
        _ctx.shuffle_strategy = _prev_strategy
        _ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = \
            _prev_agg_cpus


def _run_flagship_inner(input_dir, out_dir, cfg, checkpoint_partitions,
                        resume, with_captures, layers_dir, limit_partitions,
                        files):
    import glob
    manifest = Manifest(out_dir)
    if not resume:
        for sub in ("enriched", "captures", "failed", "ops"):
            shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
        if os.path.exists(manifest.path):
            os.remove(manifest.path)
    done = manifest.done_partitions()
    partitions = plan_partitions(files, checkpoint_partitions)
    pending = [(pid, fs) for pid, fs in partitions if pid not in done]
    if limit_partitions is not None:
        pending = pending[:limit_partitions]  # simulated-kill / paced resume

    # audit/versioning stamp on every manifest row (create-tables.sql:
    # 226-243 configuration versioning; :168-186 audit-log intent)
    from .. import __version__

    stamp = {"config_hash": cfg.config_hash(), "engine_version": __version__}

    # multi-node storage contract: fail fast if worker tasks can't see the
    # output / spill storage (no-op cost single-node; see PipelineConfig)
    assert_worker_reachable(out_dir)
    if cfg.side_channel_dir:
        assert_worker_reachable(cfg.side_channel_dir)

    layer_kwargs = enrich_stage.put_layers(layers_dir)
    t0 = time.time()
    total_rows = 0
    total_caps = 0
    total_failed = 0
    phases = {"census": 0.0, "enrich_write": 0.0, "orphans": 0.0,
              "captures": 0.0}
    for pid, part_files in pending:
        t_start = time.time()
        # --- skew plan. Bin budget: bounded above by the configured row
        # budget (north_rule size cap) and below so writes parallelize
        # (≈ 2 output bins per CPU). Parquet row counts are free metadata.
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
        est_rows = sum(pq.read_metadata(f).num_rows for f in part_files)
        # bins: bounded above by the configured budget, below only so the
        # partition count stays modest (too many bins makes the shuffle pay
        # O(blocks × bins) object fetches)
        bin_budget = int(min(cfg.partition_row_budget,
                             max(8192, est_rows // 32)))
        if est_rows > bin_budget:
            counts = census_counts(part_files,
                                   cell_col=f"h3_r{cfg.cell_partition_res}")
            salts = salt_map(counts, bin_budget)
        else:
            salts = {}
        census_s_part = time.time() - t_start
        phases["census"] += census_s_part
        t_ph = time.time()

        cap_part = os.path.join(out_dir, "captures", f"part={pid:05d}")
        cap_tmp = cap_part + ".tmp"  # must stay beside cap_part (os.replace)
        orph_tmp = (os.path.join(cfg.side_channel_dir, f"part={pid:05d}.orph")
                    if cfg.side_channel_dir else cap_part + ".orph")
        if with_captures:
            shutil.rmtree(cap_tmp, ignore_errors=True)
            shutil.rmtree(cap_part, ignore_errors=True)
            shutil.rmtree(orph_tmp, ignore_errors=True)
            os.makedirs(cap_tmp, exist_ok=True)
        enriched = enriched_dataset(
            part_files, cfg, layer_kwargs,
            caps_dir=cap_tmp if with_captures else None,
            orph_dir=orph_tmp if with_captures else None)
        enriched = enriched.map_batches(
            lambda t, _s=salts: add_part_key(t, _s, f"h3_r{cfg.cell_partition_res}"),
            batch_format="pyarrow")
        # ONE all-to-all exchange of the slim (bytes-free) rows. Two
        # equivalent tails (byte-identical output, tested):
        # - sort (default): coalesce + groupby(part_key).map_groups —
        #   Ray's sort-based shuffle. Coalescing first kills the
        #   O(map_blocks × reduce_partitions) fetch term.
        # - hash (GRAFT_TAIL=hash): repartition(keys=[part_key],
        #   sort=False) + in-block grouping. A/B at sf0.4/16 CPUs measured
        #   it SLOWER here (240 s vs 191 s; the aggregator hop costs more
        #   than the sort's sample+merge saves on this single node), kept
        #   as the multi-node candidate — on a real cluster the hash
        #   exchange streams into aggregators instead of barriering on the
        #   global sort sample.
        coal = int(os.environ.get("GRAFT_SHUFFLE_BLOCKS", "0"))
        if coal == 0:
            coal = int(max(2 * cpus, min(est_rows // 50_000, 8 * cpus)))
        part_dir = os.path.join(out_dir, "enriched", f"part={pid:05d}")
        tmp_dir = part_dir + ".tmp"
        fail_part = os.path.join(out_dir, "failed", f"part={pid:05d}")
        fail_tmp = fail_part + ".tmp"
        for d in (tmp_dir, part_dir, fail_tmp, fail_part):
            shutil.rmtree(d, ignore_errors=True)
        os.makedirs(fail_tmp, exist_ok=True)
        if os.environ.get("GRAFT_TAIL", "sort") == "hash":
            shuffled = enriched.repartition(num_blocks=coal,
                                            keys=["part_key"], sort=False)
            grouped = shuffled.map_batches(
                _make_block_writer(
                    tmp_dir, caps_dir=cap_tmp if with_captures else None,
                    fail_dir=fail_tmp, ndvi_variant=cfg.ndvi_variant),
                batch_format="pandas", batch_size=None)
        else:
            if coal > 0:
                enriched = enriched.repartition(coal)
            grouped = (enriched.groupby("part_key")
                       .map_groups(_make_part_writer(
                           tmp_dir,
                           caps_dir=cap_tmp if with_captures else None,
                           fail_dir=fail_tmp,
                           ndvi_variant=cfg.ndvi_variant),
                           batch_format="pandas"))
        lineage = grouped.to_pandas()
        enrich_write_s = time.time() - t_ph
        phases["enrich_write"] += enrich_write_s
        t_ph = time.time()
        orph_rows = 0
        if with_captures:
            orph_lineage = _resolve_orphans(orph_tmp, tmp_dir, cap_tmp,
                                            ndvi_variant=cfg.ndvi_variant)
            if len(orph_lineage):
                orph_rows = int(orph_lineage["rows"].sum())
                lineage = pd.concat([lineage, orph_lineage],
                                    ignore_index=True)
            shutil.rmtree(orph_tmp, ignore_errors=True)
        orph_s = time.time() - t_ph
        phases["orphans"] += orph_s
        t_ph = time.time()
        os.replace(tmp_dir, part_dir)
        os.replace(fail_tmp, fail_part)
        enr_lineage = lineage[lineage["kind"] == "enriched"]
        rows = int(enr_lineage["rows"].sum())
        failed_rows = int(lineage.loc[lineage["kind"] == "failed", "rows"].sum())
        t_ph = time.time()

        caps = 0
        if with_captures:
            os.replace(cap_tmp, cap_part)
            import glob as _g

            caps = sum(pq.read_metadata(f).num_rows
                       for f in _g.glob(os.path.join(cap_part, "*.parquet")))
        caps_s = time.time() - t_ph
        phases["captures"] += caps_s
        manifest.commit(pid, part_files, rows, caps, t_start,
                        lineage.to_dict("records"), stamp=stamp)
        # --- ops/monitoring dataset (reference system_metrics/api_usage
        # analogue, create-tables.sql:185-223 + rasterio_monitor.py:66-200):
        # one row per (partition, stage) with wall/rows/throughput, plus the
        # raw Ray Data per-operator stats report for the executed DAG.
        try:
            stats_text = grouped.stats()
        except Exception:
            stats_text = ""
        ops_df = pd.DataFrame([
            {"partition": pid, "stage": "census",
             "wall_s": round(census_s_part, 3),
             "rows": est_rows, "detail": ""},
            {"partition": pid, "stage": "enrich_write",
             "wall_s": round(enrich_write_s, 3), "rows": rows,
             "detail": stats_text},
            {"partition": pid, "stage": "orphan_resolve",
             "wall_s": round(orph_s, 3), "rows": orph_rows, "detail": ""},
            {"partition": pid, "stage": "captures_commit",
             "wall_s": round(caps_s, 3), "rows": caps, "detail": ""},
            {"partition": pid, "stage": "quarantine", "wall_s": 0.0,
             "rows": failed_rows, "detail": ""},
        ])
        ops_df["rows_per_sec"] = (
            ops_df["rows"] / ops_df["wall_s"].clip(lower=1e-9)).round(1)
        ops_dir = os.path.join(out_dir, "ops")
        os.makedirs(ops_dir, exist_ok=True)
        ops_path = os.path.join(ops_dir, f"part={pid:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(ops_df, preserve_index=False),
                       ops_path + ".tmp", compression="zstd")
        os.replace(ops_path + ".tmp", ops_path)
        total_rows += rows
        total_caps += caps
        total_failed += failed_rows

    dur = time.time() - t0
    recs = manifest.records()
    return {
        "partitions_total": len(partitions),
        "partitions_run": len(pending),
        "partitions_skipped": len(partitions) - len(pending),
        "rows_written": total_rows,
        "captures_written": total_caps,
        "failed_rows": total_failed,
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


def read_failed(out_dir: str):
    """The quarantine dataset: rows whose payload could not be decoded,
    routed out of the enriched output during the partition write (reference
    failed-directory semantics, main.py:244-251)."""
    import ray.data as rd

    return rd.read_parquet(os.path.join(out_dir, "failed"),
                           file_extensions=["parquet"])


def read_ops(out_dir: str):
    """Per-(partition, stage) operational metrics written by run_flagship —
    the reference's system_metrics/api_usage analogue
    (create-tables.sql:185-223); `detail` carries the raw Ray Data
    per-operator stats report for the partition's executed DAG."""
    import ray.data as rd

    return rd.read_parquet(os.path.join(out_dir, "ops"),
                           file_extensions=["parquet"])
