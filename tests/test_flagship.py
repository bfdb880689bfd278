"""Flagship end-to-end: row accounting, per-row enrichment parity against
independent single-process oracles, caption equality, validation flags,
dedup, skew budget, and byte-identical resume (FIXTURES.md §5)."""

import glob
import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tiff_enrichment_pipeline_ray.functions import codec
from tiff_enrichment_pipeline_ray.functions.geo import haversine_m
from tiff_enrichment_pipeline_ray.pipelines import flagship
from tiff_enrichment_pipeline_ray.sources import synth


@pytest.fixture(scope="module")
def enriched_df(flag_out):
    out, _ = flag_out
    return flagship.read_enriched(out).to_pandas()


@pytest.fixture(scope="module")
def failed_df(flag_out):
    out, _ = flag_out
    return flagship.read_failed(out).to_pandas()


@pytest.fixture(scope="module")
def all_df(enriched_df, failed_df):
    """enriched + quarantine = every input row."""
    return pd.concat([enriched_df, failed_df], ignore_index=True)


@pytest.fixture(scope="module")
def input_df(tiny_images_dir):
    files = sorted(glob.glob(os.path.join(tiny_images_dir, "*.parquet")))
    return pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)


class TestShuffleSlimness:
    def test_main_exchange_carries_no_payload_bytes(self, tiny_images_dir,
                                                    layers_dir, tmp_path):
        """Scale contract (SURVEY §7.4-3): the one all-to-all exchange moves
        ONLY slim enriched rows. Payload bytes must never survive past the
        decode stage — local captures are written in-task and orphan rows
        are spilled to side parquet (flagship._resolve_orphans), so no
        binary-typed column may reach the shuffle."""
        import pyarrow as pa

        from tiff_enrichment_pipeline_ray.config import PipelineConfig
        from tiff_enrichment_pipeline_ray.stages import enrich as enrich_stage

        files = sorted(glob.glob(os.path.join(tiny_images_dir, "*.parquet")))
        layer_kwargs = enrich_stage.put_layers(layers_dir)
        caps = str(tmp_path / "caps")
        orph = str(tmp_path / "orph")
        os.makedirs(caps, exist_ok=True)
        ds = flagship.enriched_dataset(files, PipelineConfig(), layer_kwargs,
                                       caps_dir=caps, orph_dir=orph)
        schema = ds.schema()
        binary_cols = [n for n, t in zip(schema.names, schema.types)
                       if pa.types.is_binary(t) or pa.types.is_large_binary(t)]
        assert binary_cols == [], binary_cols
        assert "orph_bytes" not in schema.names

    def test_capture_tree_deterministic_across_runs(self, tiny_images_dir,
                                                    layers_dir, flag_out,
                                                    tmp_path):
        """The orphan spill + bucketed mini-exchange must not introduce
        run-order nondeterminism: a second fresh run produces a
        byte-identical captures tree (file names AND bytes) — the capture
        analogue of the enriched-tree resume pin."""
        out_a, _ = flag_out
        out_b = str(tmp_path / "b")
        flagship.run_flagship(tiny_images_dir, out_b, resume=False,
                              layers_dir=layers_dir)

        def tree(root):
            files = sorted(glob.glob(os.path.join(root, "captures", "**",
                                                  "*.parquet"),
                                     recursive=True))
            return {os.path.relpath(f, root):
                    hashlib.sha256(open(f, "rb").read()).hexdigest()
                    for f in files}

        ta, tb = tree(out_a), tree(out_b)
        assert ta and ta == tb

    def test_orphan_bucket_key_stability(self):
        """o:<bucket> keys derive from the stable capture_id hash — never
        from row position or batch boundaries: the same capture_id maps to
        the same bucket regardless of how rows are batched."""
        import pyarrow as pa

        t = pa.table({"capture_id": ["c1", "c2", "c3", "c1"]})
        keyed = flagship._add_orphan_key(t, orphan_buckets=16)
        keys = keyed.column("part_key").to_pylist()
        assert keys[0] == keys[3] and all(k.startswith("o:") for k in keys)
        # batching-invariant: keying each slice alone gives the same keys
        for i in range(4):
            one = flagship._add_orphan_key(t.slice(i, 1), orphan_buckets=16)
            assert one.column("part_key").to_pylist()[0] == keys[i]


class TestAccounting:
    def test_row_conservation(self, flag_out, enriched_df, failed_df,
                              all_df, input_df):
        _, summary = flag_out
        assert len(all_df) == len(input_df)
        assert summary["rows_total_manifest"] == len(enriched_df)
        assert summary["failed_rows"] == len(failed_df)
        assert all_df.image_id.is_unique

    def test_quarantine_routing(self, enriched_df, failed_df, input_df):
        """Reference failed-directory semantics (main.py:244-251): exactly
        the undecodable rows land in failed/, none in enriched/."""
        assert len(failed_df) > 0
        assert (~failed_df.decode_ok).all()
        assert enriched_df.decode_ok.all()
        assert failed_df.issues.map(
            lambda l: "decode_failed" in list(l)).all()
        assert not set(failed_df.image_id) & set(enriched_df.image_id)

    def test_manifest_lineage(self, flag_out):
        out, _ = flag_out
        from tiff_enrichment_pipeline_ray.state.manifest import Manifest

        recs = Manifest(out).records()
        assert all(r["status"] == "done" for r in recs)
        part_rows = sum(p["rows"] for r in recs for p in r["parts"]
                        if p.get("kind", "enriched") == "enriched")
        assert part_rows == sum(r["row_count"] for r in recs)
        for r in recs:
            for p in r["parts"]:
                assert p["h3_lo"] <= p["h3_hi"]

    def test_manifest_audit_stamp(self, flag_out):
        """Round-4 audit/versioning stamp (create-tables.sql:226-243):
        every partition row records the producing config hash + engine
        version, and any toggle change changes the hash."""
        out, _ = flag_out
        from tiff_enrichment_pipeline_ray import __version__
        from tiff_enrichment_pipeline_ray.config import PipelineConfig
        from tiff_enrichment_pipeline_ray.state.manifest import Manifest

        cfg = PipelineConfig()
        for r in Manifest(out).records():
            assert r["config_hash"] == cfg.config_hash()
            assert r["engine_version"] == __version__
        other = PipelineConfig(enrich_weather=False)
        assert other.config_hash() != cfg.config_hash()
        assert PipelineConfig().config_hash() == cfg.config_hash()

    def test_caption_equality_per_row(self, all_df, input_df):
        """BASELINE.json per-row invariant: caption survives byte-equal."""
        m = all_df.merge(input_df[["image_id", "caption"]],
                              on="image_id", suffixes=("", "_in"))
        assert (m.caption == m.caption_in).all()

    def test_phash_passthrough(self, all_df, input_df):
        m = all_df.merge(input_df[["image_id", "phash"]], on="image_id",
                              suffixes=("", "_in"))
        assert (m.phash == m.phash_in).all()


class TestFastPercentiles:
    def test_bit_exact_vs_np_percentile(self):
        """The single-partition A4 percentile fast path must equal
        np.percentile(float64, (25,50,75)) BITWISE (the values land in the
        enriched parquet the oracles read)."""
        rng = np.random.default_rng(7)
        for _ in range(400):
            n = int(rng.integers(1, 500))
            px = rng.integers(0, 65536, n).astype(np.uint16)
            want = np.percentile(px.astype(np.float64), (25, 50, 75))
            got = np.array(flagship._percentiles_25_50_75(px))
            assert (want == got).all(), (n, want, got)
        px = rng.integers(0, 65536, (144, 144)).astype(np.uint16)
        want = np.percentile(px.astype(np.float64), (25, 50, 75))
        assert (np.array(flagship._percentiles_25_50_75(px)) == want).all()

    def test_no_copy_mean_std_bit_exact(self):
        rng = np.random.default_rng(8)
        for _ in range(100):
            n = int(rng.integers(1, 20000))
            px = rng.integers(0, 65536, n).astype(np.uint16)
            f = px.astype(np.float64)
            assert float(px.mean(dtype=np.float64)) == float(f.mean())
            assert float(px.std(dtype=np.float64)) == float(f.std())


class TestDecodeInvariants:
    def test_decoded_pixel_stats_and_psnr(self, all_df, input_df):
        """Decode invariant: raw/png bit-exact ⇒ phash(decoded) == phash;
        lossyq PSNR ≥ 40 dB (input_hint)."""
        sample = input_df.sample(n=150, random_state=0)
        e = all_df.set_index("image_id")
        for _, row in sample.iterrows():
            px, _, ok = codec.decode_image(row["bytes"])
            erow = e.loc[row.image_id]
            assert ok == bool(erow.decode_ok)
            if not ok:
                continue
            if row.fmt in ("raw", "png"):
                h = hashlib.blake2b(np.ascontiguousarray(px, "<u2").tobytes(),
                                    digest_size=8).digest()
                assert (int.from_bytes(h, "big") >> 1) == row.phash
            assert erow.px_mean == pytest.approx(float(px.mean()), rel=1e-12)
            assert erow.zero_ratio == pytest.approx(float((px == 0).mean()))


class TestEnrichmentParity:
    """Row-for-row parity vs independent oracles (not the engine's index
    structures): brute PIP loop, brute kNN matrix, direct terrain bilinear."""

    @pytest.fixture(scope="class")
    def sample(self, enriched_df):
        gps = enriched_df[enriched_df.has_gps & enriched_df.decode_ok]
        return gps.sample(n=min(250, len(gps)), random_state=1)

    def test_landcover_class(self, sample, layers_dir):
        lc = pq.read_table(os.path.join(layers_dir, "landcover.parquet")).to_pandas()
        rings = [np.asarray([list(p) for p in r], dtype=np.float64)
                 for r in lc.rings]
        for _, row in sample.iterrows():
            best = -1
            for pid, ring in zip(lc.polygon_id, rings):
                x, y = row.lon, row.lat
                inside = False
                k = len(ring)
                for j in range(k):
                    x0, y0 = ring[j]
                    x1, y1 = ring[(j + 1) % k]
                    if (y0 <= y < y1) or (y1 <= y < y0):
                        if x < x0 + (y - y0) * (x1 - x0) / (y1 - y0):
                            inside = not inside
                if inside and (best < 0 or pid < best):
                    best = pid
            if best < 0:
                assert pd.isna(row.landcover_class)
            else:
                want = lc.set_index("polygon_id").loc[best]
                assert row.landcover_class == want["class"]
                assert row.landcover_confidence == pytest.approx(want.confidence)
                assert row.landcover_year == want.year

    def test_weather_station_knn(self, sample, layers_dir):
        st = pq.read_table(os.path.join(layers_dir,
                                        "weather_stations.parquet")).to_pandas()
        st = st.sort_values("station_id").reset_index(drop=True)
        d = haversine_m(sample.lat.to_numpy()[:, None],
                        sample.lon.to_numpy()[:, None],
                        st.lat.to_numpy()[None, :], st.lon.to_numpy()[None, :])
        best = np.argmin(d, axis=1)  # first index wins ties = min station_id
        want = st.station_id.to_numpy()[best]
        assert (sample.weather_station_id.to_numpy() == want).all()
        np.testing.assert_allclose(sample.weather_dist_m.to_numpy(),
                                   d[np.arange(len(sample)), best], rtol=1e-12)

    def test_weather_obs_join(self, sample, layers_dir):
        obs = pq.read_table(os.path.join(layers_dir, "weather_obs.parquet")).to_pandas()
        obs["date"] = pd.to_datetime(obs["date"]).dt.strftime("%Y-%m-%d")
        omap = obs.set_index(["station_id", "date"])
        for _, row in sample.iterrows():
            key = (row.weather_station_id, row.weather_date)
            if key in omap.index:
                want = omap.loc[key]
                assert row.tmin_c == pytest.approx(want.tmin_c)
                assert row.precip_mm == pytest.approx(want.precip_mm)
            else:
                assert pd.isna(row.tmin_c)

    def test_elevation_bilinear(self, sample):
        """Independent bilinear: direct node-center interpolation of the
        terrain function's sampled grid."""
        tiles = synth.gen_elevation_tiles()
        res = tiles["res_deg"][0]
        lon0 = tiles["min_lon"].min()
        lat0 = tiles["min_lat"].min()
        # sample a few points manually
        sub = sample.head(40)
        for _, row in sub.iterrows():
            fc = (row.lon - lon0) / res - 0.5
            fr = (row.lat - lat0) / res - 0.5
            c0, r0 = int(np.floor(fc)), int(np.floor(fr))
            wc, wr = fc - c0, fr - r0
            def node(rr, cc):
                la = lat0 + (rr + 0.5) * res
                lo = lon0 + (cc + 0.5) * res
                return float(np.float32(synth.terrain_m(la, lo)))
            want = (node(r0, c0) * (1 - wr) * (1 - wc)
                    + node(r0, c0 + 1) * (1 - wr) * wc
                    + node(r0 + 1, c0) * wr * (1 - wc)
                    + node(r0 + 1, c0 + 1) * wr * wc)
            assert row.elevation_m == pytest.approx(want, abs=1e-6)
            assert row.elevation_src == "usgs_3dep"

    def test_cells_nonnull_and_consistent(self, sample):
        from tiff_enrichment_pipeline_ray.functions.cells import (
            hex7_cell,
            hex7_parent,
            s2_cell,
        )

        assert (sample.h3_r5 >= 0).all() and (sample.s2_cell != -1).all()
        lat = sample.lat.to_numpy()
        lon = sample.lon.to_numpy()
        assert (sample.h3_r9.to_numpy() == hex7_cell(lat, lon, 9)).all()
        assert (hex7_parent(sample.h3_r6.to_numpy())
                == sample.h3_r5.to_numpy()).all()
        assert (sample.s2_cell.to_numpy() == s2_cell(lat, lon, 16)).all()


class TestValidation:
    def test_small_dims_flagged(self, enriched_df):
        small = enriched_df[(enriched_df.w < 100) | (enriched_df.h < 100)]
        assert len(small) > 0
        assert small.issues.map(lambda l: "dims_too_small" in list(l)).all()

    def test_zero_ratio_flagged(self, enriched_df):
        z = enriched_df[enriched_df.decode_ok & (enriched_df.zero_ratio > 0.5)]
        assert len(z) > 0
        assert z.issues.map(lambda l: "zero_ratio_exceeded" in list(l)).all()

    def test_no_gps_flagged_and_unenriched(self, enriched_df):
        ng = enriched_df[~enriched_df.has_gps & enriched_df.decode_ok]
        assert len(ng) > 0
        assert ng.issues.map(lambda l: "missing_gps" in list(l)).all()
        assert ng.landcover_class.isna().all()
        assert ng.weather_station_id.isna().all()
        assert (ng.h3_r5 == -1).all()

    def test_in_nl_bounds(self, enriched_df):
        ok = enriched_df[enriched_df.in_nl]
        assert len(ok) > 0
        assert (ok.lat >= 50.7).all() and (ok.lat <= 53.6).all()
        assert (ok.lon >= 3.0).all() and (ok.lon <= 7.3).all()


class TestDedup:
    def test_phash_duplicates_exist_and_resolve(self, enriched_df):
        dups = enriched_df.groupby("phash").image_id.agg(["count", "min"])
        multi = dups[dups["count"] > 1]
        assert len(multi) > 0  # ~2% regular rows are template dups
        # keep-first = min image_id (deterministic)
        for ph, row in multi.head(5).iterrows():
            grp = enriched_df[enriched_df.phash == ph]
            assert row["min"] == grp.image_id.min()


class TestCaptures:
    def test_identity_path_bit_exact(self, flag_out, input_df):
        """A no-GPS capture takes the identity-alignment path: NDVI blob must
        equal the directly computed quantized NDVI, bit-for-bit."""
        out, _ = flag_out
        caps = flagship.read_captures(out).to_pandas()
        ok = caps[caps.status == "ok"]
        nogps = ok[ok.lat.isna()]
        checked = 0
        inp = input_df.set_index("image_id")
        for _, cap in nogps.head(3).iterrows():
            bands = {}
            for b in range(1, 6):
                px = codec.decode_pixels_only(inp.loc[f"{cap.capture_id}_{b}", "bytes"])
                bands[b] = px.astype(np.float32)
            from tiff_enrichment_pipeline_ray.functions import indices as I

            stack = np.stack([bands[b] for b in (1, 2, 3, 4, 5)])
            calib = I.calibrate(np.clip(stack, 0, 65535).astype("uint16").astype("float32"))
            ndvi = I.ndvi(calib[3].astype("float32"), calib[2].astype("float32"))
            want = I.quantize_index(ndvi)
            got = codec.decode_pixels_only(cap.index_ndvi)
            assert (got == want).all()
            checked += 1
        assert checked > 0 or len(nogps) == 0

    def test_capture_statuses(self, flag_out):
        out, _ = flag_out
        caps = flagship.read_captures(out).to_pandas()
        st = set(caps.status.unique())
        assert "ok" in st and "incomplete_set" in st
        okc = caps[caps.status == "ok"]
        assert (okc.n_bands == 5).all()
        assert okc.coverage_gt_02.between(0, 1).all()
        # NDVI coverage at 0.2 must be ≥ coverage at 0.5
        assert (okc.coverage_gt_02 >= okc.coverage_gt_05).all()


class TestResume:
    def test_byte_identical_after_simulated_kill(self, tiny_images_dir,
                                                 layers_dir, tmp_path):
        a = str(tmp_path / "a")
        b = str(tmp_path / "b")
        flagship.run_flagship(tiny_images_dir, a, checkpoint_partitions=2,
                              resume=False, with_captures=False,
                              layers_dir=layers_dir)
        # simulated kill after partition 0, then resume
        flagship.run_flagship(tiny_images_dir, b, checkpoint_partitions=2,
                              resume=False, with_captures=False,
                              layers_dir=layers_dir, limit_partitions=1)
        s2 = flagship.run_flagship(tiny_images_dir, b, checkpoint_partitions=2,
                                   resume=True, with_captures=False,
                                   layers_dir=layers_dir)
        assert s2["partitions_skipped"] == 1 and s2["partitions_run"] == 1
        fa = sorted(glob.glob(os.path.join(a, "enriched", "**", "*.parquet"),
                              recursive=True))
        fb = sorted(glob.glob(os.path.join(b, "enriched", "**", "*.parquet"),
                              recursive=True))
        assert [os.path.relpath(p, a) for p in fa] == \
               [os.path.relpath(p, b) for p in fb]
        for pa_, pb_ in zip(fa, fb):
            with open(pa_, "rb") as f1, open(pb_, "rb") as f2:
                assert hashlib.sha256(f1.read()).digest() == \
                    hashlib.sha256(f2.read()).digest(), pa_


class TestEnricherVariants:
    def test_actor_pool_matches_cached_task(self, tiny_images_dir, layers_dir):
        """The Enricher actor-pool stage and the cached-task stage must
        produce identical enrichment (same broadcast layers, same kernels)."""
        import glob as g

        from tiff_enrichment_pipeline_ray.config import PipelineConfig
        from tiff_enrichment_pipeline_ray.stages import enrich as E

        files = sorted(g.glob(os.path.join(tiny_images_dir, "*.parquet")))[:2]
        cfg = PipelineConfig()
        kw = E.put_layers(layers_dir)
        cols = ["image_id", "h3_r7", "s2_cell", "landcover_class",
                "elevation_m", "weather_station_id", "tmin_c"]
        a = (flagship.enriched_dataset(files, cfg, kw, actor_pool=False)
             .select_columns(cols).to_pandas()
             .sort_values("image_id").reset_index(drop=True))
        b = (flagship.enriched_dataset(files, cfg, kw, actor_pool=True)
             .select_columns(cols).to_pandas()
             .sort_values("image_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


class TestSkew:
    def test_partition_budget_respected(self, tiny_images_dir, layers_dir,
                                        tmp_path):
        from tiff_enrichment_pipeline_ray.config import PipelineConfig

        out = str(tmp_path / "skew")
        cfg = PipelineConfig(partition_row_budget=60)
        flagship.run_flagship(tiny_images_dir, out, cfg=cfg, resume=False,
                              with_captures=False, layers_dir=layers_dir)
        from tiff_enrichment_pipeline_ray.state.manifest import Manifest

        recs = Manifest(out).records()
        sizes = [p["rows"] for r in recs for p in r["parts"]]
        # sampled census ⇒ allow slack, but the hotspot cell MUST be split
        assert max(sizes) <= 60 * 3
        keys = [p["part_key"] for r in recs for p in r["parts"]]
        cells = pd.Series([k.split(":")[0] for k in keys])
        assert (cells.value_counts() > 1).any()  # at least one salted cell


class TestExports:
    """K2/K3/K7 report sinks over a flagship output (pipelines/export.py —
    reference main.py:386-388,525-535, scripts/extract_gps_to_csv_json.py)."""

    def test_metadata_json_roundtrip(self, flag_out, enriched_df, tmp_path):
        import glob
        import json

        from tiff_enrichment_pipeline_ray.pipelines import export

        out, _ = flag_out
        d = export.export_metadata_json(out, str(tmp_path / "meta_json"))
        rows = []
        for f in glob.glob(f"{d}/*.json"):
            with open(f) as fh:
                rows.extend(json.loads(line) for line in fh if line.strip())
        assert len(rows) == len(enriched_df)
        got = {r["image_id"] for r in rows}
        assert got == set(enriched_df.image_id)
        assert "issues" not in rows[0] and "lat" in rows[0]

    def test_gps_csv_only_gps_rows(self, flag_out, enriched_df, tmp_path):
        import glob

        import pandas as pd

        from tiff_enrichment_pipeline_ray.pipelines import export

        out, _ = flag_out
        d = export.export_gps_csv(out, str(tmp_path / "gps_csv"))
        df = pd.concat([pd.read_csv(f) for f in glob.glob(f"{d}/*.csv")])
        assert len(df) == int(enriched_df.has_gps.sum())
        assert set(df.columns) == {"image_id", "lat", "lon", "alt_m"}


class TestStorageContract:
    """Multi-node storage contract (PipelineConfig.side_channel_dir):
    worker-written paths must be shared storage; the orphan spill honors
    the relocation knob without changing output bytes."""

    def test_worker_reachable_probe_passes_and_cleans(self, ray_session,
                                                      tmp_path):
        d = str(tmp_path / "shared")
        flagship.assert_worker_reachable(d)
        assert glob.glob(os.path.join(d, ".reach_probe_*")) == []

    def test_side_channel_dir_relocates_orphan_spill(
            self, tiny_images_dir, layers_dir, flag_out, tmp_path,
            monkeypatch):
        from tiff_enrichment_pipeline_ray.config import PipelineConfig

        side = str(tmp_path / "scratch")
        out_b = str(tmp_path / "b")
        seen = []
        orig = flagship._resolve_orphans

        def spy(orph_tmp, tmp_dir, cap_tmp, **kw):
            seen.append(orph_tmp)
            return orig(orph_tmp, tmp_dir, cap_tmp, **kw)

        monkeypatch.setattr(flagship, "_resolve_orphans", spy)
        flagship.run_flagship(
            tiny_images_dir, out_b, resume=False, layers_dir=layers_dir,
            cfg=PipelineConfig(side_channel_dir=side))
        assert seen and all(p.startswith(side) for p in seen)

        # relocation must not change a byte of the captures output
        def tree(root):
            files = sorted(glob.glob(os.path.join(root, "captures", "**",
                                                  "*.parquet"),
                                     recursive=True))
            return {os.path.relpath(f, root):
                    hashlib.sha256(open(f, "rb").read()).hexdigest()
                    for f in files}

        out_a, _ = flag_out
        ta, tb = tree(out_a), tree(out_b)
        assert ta and ta == tb
