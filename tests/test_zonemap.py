"""File-level zone maps (sources/zonemap.py): driver-side manifest
pruning must actually skip files AND stay lossless vs the full scan."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector_db_spark.sources.zonemap import (
    read_zonemapped,
    write_zonemapped,
    zonemap_files,
)


@pytest.fixture(scope="module")
def zm_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zm") / "t")
    df = spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") % 97).cast("double").alias("v"),
        (F.col("id") * 3.5).alias("price"),
    )
    write_zonemapped(df, path, "price", n_files=16)
    return path


def test_zonemap_prunes_files(spark, zm_path):
    """A narrow band must survive in strictly fewer files than the table
    holds — range clustering makes per-file price ranges disjoint, so a
    band spanning ~3% of the key space keeps 1-2 of 16 files."""
    keep, total = zonemap_files(spark, zm_path, {"price": (1000.0, 2000.0)})
    assert total == 16
    assert 0 < len(keep) <= 3


def test_zonemap_scan_lossless(spark, zm_path):
    """Pruned scan == unpruned filter, row for row."""
    got = (
        read_zonemapped(spark, zm_path, lo=1000.0, hi=2000.0)
        .select("id", "price")
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    want = (
        spark.read.parquet(zm_path)
        .filter((F.col("price") >= 1000.0) & (F.col("price") <= 2000.0))
        .select("id", "price")
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_zonemap_plan_reads_only_survivors(spark, zm_path):
    """The PLANNED scan touches exactly the surviving files — pruning
    happens before Spark ever lists the rest (inputFiles is the plan's
    file set, not an execution counter)."""
    def norm(u):  # inputFiles says file:///x, _metadata.file_path file:/x
        return u.replace("file:///", "/").replace("file:/", "/")

    keep, total = zonemap_files(spark, zm_path, {"price": (1000.0, 2000.0)})
    scanned = read_zonemapped(spark, zm_path, lo=1000.0, hi=2000.0).inputFiles()
    assert sorted(norm(f) for f in scanned) == sorted(norm(f) for f in keep)
    assert len(scanned) < total


def test_zonemap_empty_band_keeps_schema(spark, zm_path):
    """A band outside the data prunes EVERY file; the frame still carries
    the table schema so downstream composition type-checks."""
    out = read_zonemapped(spark, zm_path, lo=1e12, hi=2e12)
    assert out.count() == 0
    assert set(out.columns) == {"id", "v", "price"}


def test_zonemap_open_ended_bounds(spark, zm_path):
    """lo-only and hi-only predicates prune from one side and stay exact."""
    got = read_zonemapped(spark, zm_path, lo=34000.0).count()
    want = spark.read.parquet(zm_path).filter(F.col("price") >= 34000.0).count()
    assert got == want
    got = read_zonemapped(spark, zm_path, hi=100.0).count()
    want = spark.read.parquet(zm_path).filter(F.col("price") <= 100.0).count()
    assert got == want


@pytest.fixture(scope="module")
def zorder_path(spark, tmp_path_factory):
    """10k rows over an (x, y) grid where the two dimensions are
    INDEPENDENT — the case lexicographic sort cannot serve: sorting by x
    leaves every file spanning all of y."""
    path = str(tmp_path_factory.mktemp("zo") / "t")
    df = spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") / 100).cast("int").cast("double").alias("y"),
    )
    write_zonemapped(df, path, ["x", "y"], n_files=64)
    return path


def test_zorder_prunes_on_either_dimension(spark, zorder_path):
    """Z-order files cover hyper-rectangles: a band on x alone AND a band
    on y alone must each prune most of the 64 files (lexicographic
    clustering would serve only the leading column)."""
    for col in ("x", "y"):
        keep, total = zonemap_files(
            spark, zorder_path, {col: (10.0, 20.0)}
        )
        assert total == 64
        # an 11% band in one dimension of a 2-D z-curve keeps ~sqrt
        # coverage; anything under half the table proves multi-dim skip
        assert 0 < len(keep) <= 24, (col, len(keep))


def test_zorder_conjunctive_bounds_prune_harder(spark, zorder_path):
    """x-band ∩ y-band survivors ⊆ each single-dimension survivor set,
    and the boxed scan is lossless vs the unpruned filter."""
    kx, _ = zonemap_files(spark, zorder_path, {"x": (10.0, 20.0)})
    ky, _ = zonemap_files(spark, zorder_path, {"y": (10.0, 20.0)})
    kboth, _ = zonemap_files(
        spark, zorder_path, {"x": (10.0, 20.0), "y": (10.0, 20.0)}
    )
    assert set(kboth) <= set(kx) and set(kboth) <= set(ky)

    got = (
        read_zonemapped(
            spark, zorder_path, bounds={"x": (10.0, 20.0), "y": (10.0, 20.0)}
        )
        .select("id")
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    want = (
        spark.read.parquet(zorder_path)
        .filter(F.col("x").between(10.0, 20.0) & F.col("y").between(10.0, 20.0))
        .select("id")
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_zonemap_date_column(spark, tmp_path):
    """Single-column zone maps carry the column's NATIVE type through the
    parquet manifest (no JSON codec): date bounds prune and stay exact."""
    import datetime as dt

    path = str(tmp_path / "t")
    base = dt.date(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, base + dt.timedelta(days=i)) for i in range(365)],
        "id long, d date",
    )
    write_zonemapped(df, path, "d", n_files=12)
    lo, hi = dt.date(2024, 3, 1), dt.date(2024, 3, 31)
    keep, total = zonemap_files(spark, path, {"d": (lo, hi)})
    assert total == 12 and 0 < len(keep) <= 3
    got = sorted(r.id for r in read_zonemapped(spark, path, lo=lo, hi=hi).collect())
    want = sorted(
        r.id
        for r in spark.read.parquet(path)
        .filter(F.col("d").between(lo, hi))
        .collect()
    )
    assert got == want and len(got) == 31


def test_zorder_date_dimension(spark, tmp_path):
    """Z-order over (date, double) — the classic time+key pair: the date
    dimension buckets through its epoch proxy, and a predicate on EITHER
    dimension prunes files."""
    import datetime as dt

    path = str(tmp_path / "t")
    base = dt.date(2024, 1, 1)
    df = spark.range(0, 4_000).select(
        F.col("id"),
        F.date_add(F.lit(base), (F.col("id") % 200).cast("int")).alias("d"),
        (F.col("id") / 200).cast("int").cast("double").alias("v"),
    )
    write_zonemapped(df, path, ["d", "v"], n_files=32)
    kd, total = zonemap_files(
        spark, path, {"d": (dt.date(2024, 2, 1), dt.date(2024, 2, 20))}
    )
    kv, _ = zonemap_files(spark, path, {"v": (5.0, 7.0)})
    assert total == 32
    assert 0 < len(kd) <= 16 and 0 < len(kv) <= 16
    got = sorted(
        r.id
        for r in read_zonemapped(
            spark,
            path,
            bounds={"d": (dt.date(2024, 2, 1), dt.date(2024, 2, 20)), "v": (5.0, 7.0)},
        ).collect()
    )
    want = sorted(
        r.id
        for r in spark.read.parquet(path)
        .filter(
            F.col("d").between(dt.date(2024, 2, 1), dt.date(2024, 2, 20))
            & F.col("v").between(5.0, 7.0)
        )
        .collect()
    )
    assert got == want and len(got) > 0


def test_zonemap_all_null_file_pruned(spark, tmp_path):
    """Files whose zone column is entirely NULL carry null stats and are
    pruned by any range predicate (BETWEEN never matches NULL), while a
    mixed file keeps its non-null rows."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 7.0), (4, None)],
        "id long, price double",
    )
    write_zonemapped(df, path, "price", n_files=2)
    got = read_zonemapped(spark, path, lo=0.0, hi=10.0)
    assert sorted(r.id for r in got.collect()) == [1, 3]


def test_append_prunes_and_preserves_existing_files(spark, tmp_path):
    """Appended batches bring their own per-file stats; existing data
    files and manifest rows never rewrite (mtime pin), and a band scan
    over the combined table prunes files from BOTH batches while staying
    lossless."""
    import glob
    import os

    from pyspark.sql import functions as F

    from vector_db_spark.sources.zonemap import (
        append_zonemapped,
        read_zonemapped,
        write_zonemapped,
        zonemap_files,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 3 % 997).cast("double").alias("v")
    )
    p = str(tmp_path / "t")
    write_zonemapped(df.filter(F.col("id") < 500), p, "v", n_files=5)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(p + "/*.parquet")
    }
    n_new = append_zonemapped(df.filter(F.col("id") >= 500), p, "v", n_files=5)
    assert n_new == 5
    # existing data files untouched
    for f, t in before.items():
        assert os.path.getmtime(f) == t
    # lossless across batches
    got = sorted(r.id for r in read_zonemapped(spark, p, lo=100.0, hi=300.0).collect())
    want = sorted(
        r.id for r in df.filter((F.col("v") >= 100.0) & (F.col("v") <= 300.0)).collect()
    )
    assert got == want
    # pruning still bites: a narrow band keeps a strict file subset
    kept, total = zonemap_files(spark, p, {"v": (0.0, 50.0)})
    assert total == len(before) + n_new
    assert len(kept) < total
    # mismatched append columns refuse
    import pytest as _pt

    with _pt.raises(ValueError, match="manifest columns"):
        append_zonemapped(df, p, "id")


def test_append_onto_unmanifested_table_refuses(spark, tmp_path):
    """Appending zone manifests onto a table that has data files but NO
    manifest would leave the pre-existing files invisible to pruning
    (silent row loss) — it must refuse and demand a full write."""
    import pytest as _pt

    from vector_db_spark.sources.zonemap import append_zonemapped

    path = str(tmp_path / "plain")
    spark.range(0, 100).selectExpr("id", "id * 2 AS v").write.parquet(path)
    batch = spark.range(100, 120).selectExpr("id", "id * 2 AS v")
    with _pt.raises(ValueError, match="no zone manifest"):
        append_zonemapped(batch, path, "id")


def test_append_manifest_covers_new_files_on_special_char_path(spark, tmp_path):
    """ADVICE r10 (medium): append's manifest stats used to isin-match
    Hadoop Path.toString() strings against _metadata.file_path; any
    normalization divergence (spaces, percent signs, object-store URI
    forms) silently matched ZERO rows, appending an empty manifest batch
    that left the new files invisible to pruning — undetectable by the
    cross-column consistency check. Stats now read the appended files
    directly and assert one manifest row per file; a path with a space
    and a percent sign must still manifest every appended file."""
    from pyspark.sql import functions as F

    from vector_db_spark.sources.zonemap import (
        append_zonemapped,
        read_zonemapped,
        write_zonemapped,
        zonemap_files,
    )

    p = str(tmp_path / "zone map %2F t")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v")
    )
    write_zonemapped(df.filter("id < 500"), p, "v", n_files=4)
    n_new = append_zonemapped(df.filter("id >= 500"), p, "v", n_files=4)
    assert n_new == 4
    kept, total = zonemap_files(spark, p, {"v": (None, None)})
    assert total == 8  # every appended file has a manifest row
    got = sorted(r.id for r in read_zonemapped(spark, p, lo=10.0, hi=20.0).collect())
    want = sorted(
        r.id
        for r in df.filter((F.col("v") >= 10.0) & (F.col("v") <= 20.0)).collect()
    )
    assert got == want


def test_zonemap_point_predicate_reads_o1_manifest_parts(spark, tmp_path):
    """VERDICT r10 #7: two-level manifests. With 256 manifest parts (one
    data file each here), a narrow range predicate must open O(1) parts —
    the `_index/` summary proves the rest irrelevant before any read —
    while staying lossless, surviving appends, and keeping the
    unconstrained case complete."""
    from pyspark.sql import functions as F

    from vector_db_spark.sources.zonemap import (
        LAST_PRUNE,
        append_zonemapped,
        read_zonemapped,
        write_zonemapped,
        zonemap_files,
    )

    p = str(tmp_path / "big")
    df = spark.range(100_000).select(
        F.col("id"), F.col("id").cast("double").alias("v")
    )
    write_zonemapped(df, p, "v", n_files=256, manifest_bucket_rows=1)
    kept, total = zonemap_files(spark, p, {"v": (500.0, 600.0)})
    assert total == 256
    pr = dict(LAST_PRUNE["v"])
    assert pr["parts_total"] >= 256
    assert pr["parts_read"] <= 3, pr  # O(1) of >= 256
    got = sorted(r.id for r in read_zonemapped(spark, p, lo=500.0, hi=600.0).collect())
    assert got == list(range(500, 601))  # lossless through the index
    # unconstrained bounds keep everything
    kept_all, _ = zonemap_files(spark, p, {"v": (None, None)})
    assert len(kept_all) == 256
    # appended batch gets its own parts; a point predicate into the OLD
    # range still reads O(1) parts, and rows from both batches survive
    extra = spark.range(100_000, 101_000).select(
        F.col("id"), F.col("id").cast("double").alias("v")
    )
    n_new = append_zonemapped(extra, p, "v", n_files=4, manifest_bucket_rows=1)
    assert n_new == 4
    _, total2 = zonemap_files(spark, p, {"v": (500.0, 600.0)})
    assert total2 == 260
    assert LAST_PRUNE["v"]["parts_read"] <= 3
    got2 = sorted(
        r.id for r in read_zonemapped(spark, p, lo=99_999.0, hi=100_001.0).collect()
    )
    assert got2 == [99_999, 100_000, 100_001]  # spans both batches


def test_append_onto_pre_index_manifest_backfills_summary(spark, tmp_path):
    """A table whose manifests predate the two-level layout (no _index/)
    must get its summary BACKFILLED when appended onto — a summary
    covering only the new batch would make pruning read just the new
    parts and silently drop every pre-existing file."""
    import shutil

    from pyspark.sql import functions as F

    from vector_db_spark.sources.zonemap import (
        append_zonemapped,
        read_zonemapped,
        write_zonemapped,
        zonemap_files,
    )

    p = str(tmp_path / "legacy")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v")
    )
    write_zonemapped(df.filter("id < 500"), p, "v", n_files=4)
    # simulate the pre-r11 layout: flat manifest, no _index/
    shutil.rmtree(p + "/_zonemap/v/_index")
    n_new = append_zonemapped(df.filter("id >= 500"), p, "v", n_files=4)
    assert n_new == 4
    kept, total = zonemap_files(spark, p, {"v": (None, None)})
    assert total == 8 and len(kept) == 8  # old files still visible
    got = sorted(r.id for r in read_zonemapped(spark, p, lo=10.0, hi=20.0).collect())
    want = sorted(
        r.id
        for r in df.filter((F.col("v") >= 10.0) & (F.col("v") <= 20.0)).collect()
    )
    assert got == want  # rows from BOTH batches survive pruning


def test_unindexed_manifest_part_raises_stale_index(spark, tmp_path):
    """ADVICE r11: a crash between a manifest-part append and its
    _index append leaves parts on disk that the summary never
    references — the pruned read would silently skip their files. The
    reverse-direction check must refuse to read such a layout."""
    import os
    import shutil

    from vector_db_spark.sources.zonemap import read_zonemapped, write_zonemapped

    p = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2.0).alias("v")
    )
    write_zonemapped(df, p, "v", n_files=4)
    man_dir = p + "/_zonemap/v"
    part = next(
        f for f in os.listdir(man_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    # simulate the torn append: a part lands, its _index row never does
    shutil.copy(
        os.path.join(man_dir, part),
        os.path.join(man_dir, "part-99999-orphan.parquet"),
    )
    with pytest.raises(ValueError, match="stale index"):
        read_zonemapped(spark, p, lo=0.0, hi=10.0).collect()
