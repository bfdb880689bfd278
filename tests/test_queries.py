"""Driver-gate pre-flight: every oracle-backed queries() entry must match its
DuckDB oracle at sf0.001 (schema + rows + order-insensitive values) — the
same compare the driver performs at sf0.01."""

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def gate():
    import os

    import duckdb

    import __ray_entry__ as entrymod

    os.environ["GRAFT_ORACLE_SF"] = "0.001"  # tests compare at sf0.001
    con = duckdb.connect()
    sf_dir = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    return entrymod, con, sf_dir


ORACLED = ["q1_pricing_summary", "q3_shipping_priority", "q5_regional_revenue",
           "orders_per_segment", "top10_customers", "part_brand_stats",
           "supplier_nation_balance", "events_hourly", "events_user_daily",
           "events_top_values", "events_type_minmax", "doc_exact_dedup",
           "doc_token_counts", "doc_quality_counts", "doc_lang_stats",
           "doc_source_stats", "ann_topk_cosine", "embedding_label_stats",
           "geo_tile_census", "geo_knn_station", "geo_point_in_rect",
           # round 2: near-dup self-join + heuristic scoring + oracles over
           # the materialized flagship output
           "embedding_near_dup", "doc_quality_scores",
           "file_class_counts", "gps_export", "validation_report",
           "image_exact_dedup", "enriched_daily_stats", "band_stats_by_class",
           # round 2b: quarantine + ops metrics + flagship projections
           "quarantine_report", "ops_stats",
           "flagship_enriched", "flagship_captures",
           # round 2c: streaming-window operators (sessionize / as-of +
           # range join / ordered per-key window / distributed top-k per
           # group), all integer-only or order-insensitive → bit-exact SQL
           "events_sessionize", "events_asof_purchase",
           "events_rolling_max", "events_topk_per_type",
           # round 2c: exact trigram-Jaccard join recomputed entirely in SQL
           "doc_ngram_jaccard_pairs",
           # round 2c: EXISTS semi-join + broadcast dimension join
           "q4_priority_semijoin", "q14_promo_revenue",
           # round 2c: deterministic hash train/val/test split
           "doc_train_split",
           # round 2d: Gopher-style repetition filter, corpus vocab build,
           # PII scrub (regex plumbing; semantics pinned in test_text.py)
           "doc_repetition_stats", "doc_vocab_topk", "doc_pii_scrub",
           # round 2d: distributed k-NN join (per-query partial top-k)
           "ann_knn_join",
           # round 2d: exact distinct-per-group (HLL's exact companion)
           "events_distinct_users",
           # round 2d: snapshot compaction (latest row per key)
           "events_latest_per_user",
           # round 2d: BM25 relevance (two-pass broadcast; rational IDF)
           "doc_bm25_scores",
           # round 2e: connected-components near-dup cluster resolution
           # (distributed hash-min label propagation vs recursive-CTE SQL)
           "doc_dup_clusters",
           # round 2e: exact per-group percentiles + cross-modal caption dedup
           "events_value_percentiles", "caption_exact_dedup"]

ROWS_ONLY = ["doc_fingerprints", "dedup_minhash_docs", "dedup_simhash_docs",
             "dedup_simhash_pairs", "thumbnails", "events_hll_users",
             "audio_stats", "video_frame_sample", "ann_lsh_topk"]


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(gate, name):
    from tools.minidriver import compare, to_pandas

    entrymod, con, sf_dir = gate
    ray_df = to_pandas(entrymod.queries()[name](sf_dir))
    sql_df = con.sql(entrymod.oracle_sql()[name]).df()
    err = compare(name, ray_df, sql_df)
    assert err is None, err


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(gate, name):
    from tools.minidriver import to_pandas

    entrymod, _, sf_dir = gate
    df = to_pandas(entrymod.queries()[name](sf_dir))
    assert len(df) >= 0 and len(df.columns) > 0


def test_dup_clusters_match_union_find(gate):
    """doc_dup_clusters == brute-force union-find over the verified pair set
    (independent of the SQL oracle's transitive-closure formulation)."""
    from tools.minidriver import to_pandas

    entrymod, _, sf_dir = gate
    q = entrymod.queries()
    pairs = to_pandas(q["doc_ngram_jaccard_pairs"](sf_dir))
    clusters = to_pandas(q["doc_dup_clusters"](sf_dir))

    parent = {int(d): int(d) for d in clusters.doc_id}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.doc_a, pairs.doc_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to min-id roots (find compresses to the min because
    # unions always attach the larger root under the smaller)
    expect = {d: find(d) for d in parent}
    got = dict(zip(clusters.doc_id.astype(int), clusters.cluster_id.astype(int)))
    assert got == expect
    assert bool((clusters.is_rep == (clusters.doc_id == clusters.cluster_id)).all())


def test_px_histogram_matches_brute_force(gate):
    """px_histogram (distributed np.histogram partials + Sum merge) ==
    single-process histogram over every decoded image at sf0.001."""
    import numpy as np
    import pyarrow.parquet as pq

    from tiff_enrichment_pipeline_ray.functions import codec as C
    from tiff_enrichment_pipeline_ray.sources import synth
    from tools.minidriver import to_pandas

    entrymod, _, sf_dir = gate
    got = to_pandas(entrymod.queries()["px_histogram"](sf_dir)) \
        .sort_values("bin").reset_index(drop=True)

    img_dir = synth.ensure_images(synth.sf_from_dir(sf_dir))
    expect = np.zeros(256, dtype=np.int64)
    for blob in pq.read_table(img_dir, columns=["bytes"]).column("bytes").to_pylist():
        px = C.decode_pixels_only(blob)
        if px is not None:
            expect += np.histogram(px, bins=256, range=(0, 65536))[0]
    assert got.bin.tolist() == list(range(256))
    assert np.array_equal(got["count"].to_numpy(dtype=np.int64), expect)


def test_oracle_keys_subset_of_queries(gate):
    entrymod, _, _ = gate
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, o - q
