"""Benchmark entry point (driver contract).

Runs the headline flagship pipeline (enriched rows/sec: decode + EXIF parse +
georef + hex7/S2 assign + STRtree PIP + elevation bilinear + kNN weather +
salted partitioned write) over the synthetic images table at the scale implied
by $GRAFT_SF_DIR, plus a representative set of driver queries over the
testdata tables. Prints exactly ONE JSON line on stdout.

    python bench.py                 # one run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling       # fresh processes at two CPU levels
                                    # (default 4 vs 16 — see run_scaling and
                                    # BASELINE.md "hardware ceiling") on the
                                    # same input → throughputs + efficiency
                                    # (the sandbox stand-in for N vs 4N nodes)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def _quiet():
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    logging.getLogger("ray").setLevel(logging.ERROR)


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        # log_to_driver=False: raylet/worker warnings otherwise land on
        # STDOUT and the bench contract is ONE JSON line there
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    _quiet()
    from tiff_enrichment_pipeline_ray.pipelines import flagship
    from tiff_enrichment_pipeline_ray.pipelines import queries as Q
    from tiff_enrichment_pipeline_ray.sources import synth

    sf = synth.sf_from_dir(sf_dir)
    img_dir = synth.ensure_images(sf)          # cached; untimed
    synth.ensure_layers()
    # warm the page cache so we measure compute+shuffle, not first disk read
    import glob

    for f in glob.glob(os.path.join(img_dir, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    # warm the worker pool (cold-start of N worker processes is cluster
    # bootstrap, not steady-state throughput) — a trivial execution suffices
    import ray.data as rd

    def _warm(b):
        import pandas  # noqa: F401

        from tiff_enrichment_pipeline_ray.functions import cells, codec  # noqa: F401
        from tiff_enrichment_pipeline_ray.stages import extract  # noqa: F401
        return b

    rd.range(num_cpus * 4, override_num_blocks=num_cpus * 4) \
        .map_batches(_warm, batch_size=1).count()

    # stale outputs from earlier rounds/campaigns both eat disk (observed:
    # 32 GB → 74% full → every run ~1.6× slower) and are never reused
    shutil.rmtree("/tmp/graft_bench", ignore_errors=True)
    out = f"/tmp/graft_bench/flag_sf{sf:g}_cpus{num_cpus}"
    # best-of-2 (skippable): this VM shows ±15-30% run-to-run noise
    # (BASELINE.md "Scaling measurements"); min is the standard wall-clock
    # estimator. --scaling subprocesses set GRAFT_BENCH_REPS=1 — they
    # already interleave their own repetitions. The inter-rep hygiene is
    # required: without gc.collect (releases the prior rep's object-store
    # refs — lazy eviction otherwise overlaps the next run) + sync (flushes
    # ~5 GB of dirty output writeback) + settle, rep 2 measures 1.6-2.4×
    # slower than rep 1 on identical code.
    import gc
    import subprocess

    reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
    flag_runs = []
    for _ in range(max(1, reps)):
        shutil.rmtree(out, ignore_errors=True)
        gc.collect()
        subprocess.run(["sync"], check=False)
        time.sleep(5)
        t0 = time.time()
        summary = flagship.run_flagship(img_dir, out, resume=False)
        flag_runs.append((time.time() - t0, summary))
    flagship_sec, summary = min(flag_runs, key=lambda r: r[0])
    flag_runs = [t for t, _ in flag_runs]

    qtimes = {}
    qlist = [] if os.environ.get("GRAFT_SKIP_QUERIES") else [
        ("q1_pricing_summary", Q.q1_pricing_summary),
        ("events_user_daily", Q.events_user_daily),
        ("doc_exact_dedup", Q.doc_exact_dedup),
        ("dedup_minhash_docs", Q.dedup_minhash_docs),
        # round 4: the two other heavyweight near-dup pipelines, so the
        # per-round artifact tracks their claw-back (ngram ~30 s → ~6 s,
        # clusters ~28-47 s → ~7-10 s at sf0.1/32)
        ("doc_ngram_jaccard_pairs", Q.doc_ngram_jaccard_pairs),
        ("doc_dup_clusters", Q.doc_dup_clusters),
        # round 4: span-level exact dedup — the highest-row-volume text op
        # (O(total tokens) gram rows through one exchange)
        ("doc_substring_dup_spans", Q.doc_substring_dup_spans),
        ("ann_topk_cosine", Q.ann_topk_cosine),
        ("geo_knn_station", Q.geo_knn_station),
        ("geo_tile_census", Q.geo_tile_census),
        # round 4 late: the highest-volume new ops — chip flat-map (~1.1M
        # output rows), token-pass PMI (2 exchanges), both-sides-large kNN
        ("image_tile_chips", Q.image_tile_chips),
        ("doc_bigram_pmi", Q.doc_bigram_pmi),
        ("geo_knn_join", Q.geo_knn_join),
        # round 4b: the iterative graph loop (5 rounds x 2 exchanges) —
        # exchange-floor-bound by design; tracked so a floor regression
        # in the loop pattern shows up per-round
        ("graph_pagerank", Q.graph_pagerank),
        # round 4c: the decode-heaviest corpus pass outside the flagship —
        # full per-image overview pyramids (~1.7M rows at sf0.1)
        ("image_overview_pyramid", Q.image_overview_pyramid),
        # round 4d: the multi-exchange spatial-clustering heavyweight
        # (grid exchange + flag attach + in-task rep CC + label-back +
        # border min) and the ESDA neighbor-aggregation exchange
        ("geo_dbscan_clusters", Q.geo_dbscan_clusters),
        ("geo_getis_hotspots", Q.geo_getis_hotspots),
        # round 5: the two heaviest new ops — OD matrix (argmin/argmax
        # exchange + two preaggs) and Ripley's K (the widest grid
        # pair-count exchange: 9 copies/point at 0.031-deg cells)
        ("geo_od_matrix", Q.geo_od_matrix),
        ("geo_ripley_k", Q.geo_ripley_k),
    ]
    for name, fn in qlist:
        t0 = time.time()
        res = fn(sf_dir)
        if hasattr(res, "count"):
            res.count()  # consume lazy datasets
        qtimes[name] = round(time.time() - t0, 3)

    return {
        "metric": "flagship enriched rows/sec (decode+EXIF+georef+cells+PIP+elev+kNN+salted write)",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "num_cpus": num_cpus,
        "rows": summary["rows_written"],
        "captures": summary["captures_written"],
        "rows_per_sec": round(summary["rows_written"] / flagship_sec, 1),
        "flagship_runs_sec": [round(t, 3) for t in flag_runs],
        # phase split of the best run (census pass / fused map chain +
        # shuffle + partitioned write / orphan-capture resolution) so the
        # headline number is self-explaining
        "flagship_phases_sec": summary.get("phases_sec", {}),
    }


def run_scaling(sf_dir: str, lo: int | None = None, hi: int | None = None) -> dict:
    """Two fresh interpreter sessions on identical input (cluster-size N vs
    4N stand-in per BASELINE.md); efficiency = (T_lo/T_hi)/(hi/lo).

    Default pairing is 4 vs 16 CPUs: a calibration microbench (BASELINE.md
    "hardware ceiling") shows this VM itself scales pure-numpy work 8→32 at
    only ~0.74 (hypervisor/memory-bandwidth overcommit above ~16 busy cores),
    so 8→32 measures the box, not the engine; 4→16 stays under the
    overcommit knee (hardware ceiling 0.96) and is the honest N vs 4N
    stand-in. Override with GRAFT_SCALE_LO / GRAFT_SCALE_HI.

    Scaling is measured at sf0.4 (~2M rows, ~14 GB input) regardless of
    $GRAFT_SF_DIR: efficiency is a property of the steady state, and at
    sf0.1 the fixed per-run terms (session bootstrap, sort-sample barrier,
    lineage commit — ~10-15 s independent of CPU count) are ~25% of a
    16-CPU run, so a small-sf pairing grades those constants and VM noise,
    not the engine (BASELINE.md "sf0.1 context"). At 100 TB the fixed terms
    vanish; sf0.4 is the largest input this sandbox can regenerate + run
    six times within a campaign. Override with GRAFT_SCALE_SF."""
    import subprocess

    lo = lo or int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = hi or int(os.environ.get("GRAFT_SCALE_HI", "16"))
    scale_sf = os.environ.get("GRAFT_SCALE_SF", "0.4")
    # only the basename's sf matters: bench resolves input via
    # synth.ensure_images(sf_from_dir(...)), which synthesizes + caches
    if os.environ.get("GRAFT_SF_DIR") and sf_dir != f"/root/testdata/sf{scale_sf}":
        print(f"[bench --scaling] GRAFT_SF_DIR={os.environ['GRAFT_SF_DIR']} is "
              f"ignored for the scaling campaign (pinned to sf{scale_sf}; "
              f"override with GRAFT_SCALE_SF)", file=sys.stderr)
    sf_dir = f"/root/testdata/sf{scale_sf}"

    def one(ncpu):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir,
                   GRAFT_SKIP_QUERIES="1",  # scaling measures the flagship only
                   GRAFT_BENCH_REPS="1")    # the lo/hi interleave is the rep
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    def hygiene():
        # flush the previous run's dirty pages so its writeback doesn't
        # bleed into the next timed section. Deliberately NO drop_caches:
        # every run re-warms the page cache untimed before its timed
        # section, so dropping caches measures nothing extra — it only
        # front-loads a burst of disk I/O that perturbs the hypervisor
        # right before the timed run (the two sync-only tight series read
        # 0.80-0.91 on every pair; the drop_caches campaigns swung
        # 0.62-0.997 — see BASELINE.md "Scaling measurements").
        import subprocess as sp

        sp.run(["sync"], check=False)
        time.sleep(2)

    # input generation is cached by ensure_images and each run warms the page
    # cache before its timed section. Three runs per level, interleaved
    # (lo,hi,lo,hi,...) so slow VM phases hit both levels equally, best-of
    # (the sandbox VM shows ±15% run-to-run noise; min is the standard
    # estimator for wall-clock benches).
    runs_lo, runs_hi = [], []
    for _ in range(3):
        hygiene()
        runs_lo.append(one(lo))
        hygiene()
        runs_hi.append(one(hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    # The interleave exists so each (lo, hi) PAIR shares VM state; per-pair
    # efficiencies are the noise-controlled readings (min-min mixes VM
    # phases hours apart — observed to swing the ratio ±0.2 on this VM).
    # Headline = median of pairs; min-min reported alongside.
    pairs = [round((a["value"] / b["value"]) / (hi / lo), 3)
             for a, b in zip(runs_lo, runs_hi)]
    med = sorted(pairs)[len(pairs) // 2] if len(pairs) % 2 else round(
        (sorted(pairs)[len(pairs) // 2 - 1] + sorted(pairs)[len(pairs) // 2]) / 2, 3)
    return {
        "metric": "scaling efficiency (fresh ray sessions, same input)",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "rows_per_sec_lo": r_lo["rows_per_sec"],
        "rows_per_sec_hi": r_hi["rows_per_sec"],
        "scaling_efficiency": med,
        "minmin_efficiency": round(
            (r_lo["value"] / r_hi["value"]) / (hi / lo), 3),
        "pair_efficiencies": pairs,
        "best_pair_efficiency": max(pairs),
        "sec_lo_runs": [r["value"] for r in runs_lo],
        "sec_hi_runs": [r["value"] for r in runs_hi],
        "sf": r_hi["sf"],
        "rows": r_hi["rows"],
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        result = run_bench(sf_dir, ncpu)
        print(json.dumps(result))
        import ray

        ray.shutdown()
