"""Report sinks: CSV/JSON exports of the enriched table (K2/K3/K7).

Reference writers re-expressed as Dataset sinks:
- K7 GPS CSV/JSON (scripts/extract_gps_to_csv_json.py:22-57)
- K3 validation report JSON+CSV (main.py:525-535)
- K2 per-record metadata JSON (main.py:386-388) — metadata lives as columns,
  exported with ``write_json``.
"""

from __future__ import annotations

import os


def export_gps_csv(out_dir: str, export_dir: str):
    """K7: image_id/lat/lon/alt CSV part files from a flagship output dir."""
    import pandas as pd

    from . import flagship

    ds = flagship.read_enriched(out_dir).select_columns(
        ["image_id", "has_gps", "lat", "lon", "alt_m"])

    def rnd(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.has_gps].copy()
        for c in ("lat", "lon", "alt_m"):
            df[c] = df[c].round(8)
        return df.drop(columns=["has_gps"])

    ds.map_batches(rnd, batch_format="pandas").write_csv(export_dir)
    return export_dir


def export_validation_report(out_dir: str, export_dir: str, fmt: str = "csv"):
    """K3: per-image issues report as CSV or JSON part files."""
    import pandas as pd

    from . import flagship

    ds = flagship.read_enriched(out_dir).select_columns(
        ["image_id", "valid", "issues"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "image_id": df.image_id,
            "valid": df.valid,
            "issues": df.issues.map(lambda l: ";".join(list(l))),
        })

    ds = ds.map_batches(f, batch_format="pandas")
    if fmt == "json":
        ds.write_json(export_dir)
    else:
        ds.write_csv(export_dir)
    return export_dir


def export_metadata_json(out_dir: str, export_dir: str):
    """K2: full per-image metadata rows as JSON part files."""
    from . import flagship

    ds = flagship.read_enriched(out_dir).drop_columns(["issues"])
    ds.write_json(export_dir)
    return export_dir
