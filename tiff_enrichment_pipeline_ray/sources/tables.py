"""Table IO facade: Lance-preferred, parquet fallback (SURVEY §7.0).

The north_rule targets Lance tables; this sandbox has no ``pylance``, so the
facade exposes a Lance-shaped API (`read_table` / `write_table` on a dataset
directory) backed by ``ray.data.read_parquet`` / ``write_parquet``. When
``lance`` is importable the same calls route to ``read_lance``/``write_lance``.
Column pruning is always pushed into the read.
"""

from __future__ import annotations

import os

try:  # pragma: no cover - not installable in this sandbox
    import lance  # noqa: F401
    _HAS_LANCE = True
except Exception:
    _HAS_LANCE = False


def read_table(path: str, columns=None, **kwargs):
    """ray.data.Dataset from a Lance/Parquet dataset dir or file."""
    import ray.data as rd

    if _HAS_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))):
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_table(ds, path: str, **kwargs):
    if _HAS_LANCE and path.endswith(".lance"):
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)


def testdata_path(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def read_testdata(sf_dir: str, table: str, columns=None):
    return read_table(testdata_path(sf_dir, table), columns=columns)
