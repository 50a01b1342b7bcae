"""Round-13 sub-second-tail optimization: tables.t() memoizes the table
DataFrame HANDLE per (session, path, mtime, size).

Pins the three properties that make the memo safe:
- same session + same file -> same handle (the ~100 ms relation-init
  saving), and the handle still computes correct results;
- a regenerated file (mtime bump) gets a FRESH relation — stale file
  listings cannot survive a testdata swap;
- results are never cached: two actions on the memoized handle re-read
  the (updated) parquet bytes.
"""

from __future__ import annotations

import os
import shutil

from energy_emissions_lakehouse_spark.tables import t


def test_same_session_same_file_returns_same_handle(spark, sf_dir):
    a = t(spark, sf_dir, "region")
    b = t(spark, sf_dir, "region")
    assert a is b
    assert a.count() == b.count() > 0


def test_mtime_bump_invalidates(spark, sf_dir, tmp_path):
    src = os.path.join(sf_dir, "region.parquet")
    dst_dir = tmp_path / "sfcopy"
    dst_dir.mkdir()
    dst = str(dst_dir / "region.parquet")
    shutil.copyfile(src, dst)
    a = t(spark, str(dst_dir), "region")
    n_a = a.count()
    # regenerate the file (same content, new mtime) -> fresh relation
    os.utime(dst, ns=(os.stat(dst).st_mtime_ns + 10**9,) * 2)
    b = t(spark, str(dst_dir), "region")
    assert a is not b
    assert b.count() == n_a


def test_rewritten_file_serves_new_rows(spark, sf_dir, tmp_path):
    dst_dir = tmp_path / "sfgen"
    dst_dir.mkdir()
    dst = str(dst_dir / "region.parquet")
    shutil.copyfile(os.path.join(sf_dir, "region.parquet"), dst)
    n0 = t(spark, str(dst_dir), "region").count()
    # swap in a larger file: the memo must serve the NEW data
    bigger = t(spark, sf_dir, "region").unionAll(t(spark, sf_dir, "region"))
    tmp_out = str(dst_dir / "out")
    bigger.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    import glob

    part = glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
    shutil.copyfile(part, dst)
    assert t(spark, str(dst_dir), "region").count() == 2 * n0
