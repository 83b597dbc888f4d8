"""Z-order layout: prove the data-skipping payoff with real parquet
footers — after `zorder_layout`, EVERY interleaved column has narrow
per-file min/max ranges, while a single-column sort leaves the other
column's ranges at full width."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cdc_agents_data_stream_spark.operators import zorder as Z
from cdc_agents_data_stream_spark.queries.base import load

SF = "/root/testdata/sf0.001"


def _file_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) per parquet file for a column, from footer statistics."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def _mean_width(ranges: list[tuple]) -> float:
    return sum(hi - lo for lo, hi in ranges) / len(ranges)


@pytest.fixture(scope="module")
def norm(spark):
    ev = load(spark, SF, "events")
    return ev.select(
        "event_id",
        (F.col("user_id") % 1024).cast("long").alias("ux"),
        F.least(F.round(F.col("value")).cast("long"), F.lit(1023)).alias("vy"),
    ).cache()


def test_zorder_key_matches_python(spark, norm):
    rows = Z.with_zorder_key(norm, ["ux", "vy"], 10).limit(200).collect()
    for r in rows:
        expect = 0
        for b in range(10):
            expect |= ((r["ux"] >> b) & 1) << (2 * b)
            expect |= ((r["vy"] >> b) & 1) << (2 * b + 1)
        assert r["zval"] == expect


def test_zorder_layout_narrows_both_columns(spark, norm, tmp_path):
    zdir = str(tmp_path / "zordered")
    sdir = str(tmp_path / "single_sorted")
    Z.zorder_layout(norm, ["ux", "vy"], 10, num_files=8).write.parquet(zdir)
    # strawman: classic single-column sort layout
    norm.repartitionByRange(8, F.col("ux")).sortWithinPartitions("ux").write.parquet(
        sdir
    )

    full_vy = _mean_width(_file_ranges(sdir, "vy"))
    z_ux = _mean_width(_file_ranges(zdir, "ux"))
    z_vy = _mean_width(_file_ranges(zdir, "vy"))
    s_ux = _mean_width(_file_ranges(sdir, "ux"))

    # single-column sort: ux tight, vy at (near-)full width
    assert s_ux < 0.35 * full_vy or s_ux < 120
    # z-order: BOTH columns substantially narrower than the unsorted width
    assert z_ux < 0.6 * 1024
    assert z_vy < 0.6 * full_vy
    # and the z layout beats the single-sort layout on the neglected column
    assert z_vy < 0.75 * full_vy

    # skipping proof by predicate: a narrow vy predicate touches fewer
    # files in the z layout than in the ux-sorted layout
    lo, hi = 100, 130
    z_hit = sum(1 for mn, mx in _file_ranges(zdir, "vy") if not (mx < lo or mn > hi))
    s_hit = sum(1 for mn, mx in _file_ranges(sdir, "vy") if not (mx < lo or mn > hi))
    assert z_hit <= s_hit


def test_parquet_bloom_filter_written_for_point_lookup_column(spark, tmp_path):
    """Lake-layout knob: parquet bloom filters on the point-lookup key —
    the file-skipping aid for high-cardinality keys where min/max zones
    are useless. This container's pyarrow (16.x) does not expose
    `bloom_filter_offset`, so the proof is byte-level: with the NDV hint
    the bloom-enabled files carry a bounded extra payload vs the plain
    write (and WITHOUT the hint Spark's default sizing costs ~2 MB for a
    1k-row file — the sizing knob is part of the lesson)."""
    import os

    from cdc_agents_data_stream_spark.queries.base import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value"
    )
    with_bloom = str(tmp_path / "bloom")
    without = str(tmp_path / "plain")
    (
        ev.repartition(2)
        .write.option("parquet.bloom.filter.enabled#event_id", "true")
        .option("parquet.bloom.filter.expected.ndv#event_id", "2000")
        .parquet(with_bloom)
    )
    ev.repartition(2).write.parquet(without)

    def total(path):
        return sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )

    extra = total(with_bloom) - total(without)
    # 2 files x a ~2k-NDV bloom (~4 KB each at fpp 0.01) plus headers:
    # present, but nowhere near the unsized 2 MB default
    assert 2_000 < extra < 100_000, extra


def test_zorder_layout_concentrates_matches_in_fewer_files(spark, norm, tmp_path):
    """Runtime locality proof: under a 2-D box predicate, the files that
    actually yield rows (``_metadata.file_path``) must be a small subset
    of the z-ordered layout but spread across (nearly) every file of a
    hash-random layout — the measurable payoff file skipping builds on.
    Results themselves must be layout-invariant."""
    zdir = str(tmp_path / "z")
    rdir = str(tmp_path / "rand")
    Z.zorder_layout(norm, ["ux", "vy"], 10, num_files=8).write.parquet(zdir)
    norm.repartition(8).write.parquet(rdir)

    pred = "ux < 128 AND vy < 16"  # ~2% box (vy occupies only 0..100)

    def probe(path):
        df = spark.read.parquet(path).filter(pred)
        agg = df.agg(
            F.count("*").alias("n"), F.sum("event_id").alias("s")
        ).collect()[0]
        nfiles = (
            spark.read.parquet(path)
            .filter(pred)
            .select(F.col("_metadata.file_path").alias("f"))
            .distinct()
            .count()
        )
        return agg["n"], agg["s"], nfiles

    n_z, s_z, files_z = probe(zdir)
    n_r, s_r, files_r = probe(rdir)
    assert (n_z, s_z) == (n_r, s_r)  # layout never changes answers
    assert n_z > 0
    # random layout smears matches over (almost) all 8 files; the z-order
    # curve keeps the 128x128 box inside a contiguous key range
    assert files_r >= 6
    assert files_z < files_r
    assert files_z <= 3
