"""Unit behavior of bench.py's measurement helpers.

The bench is a committed evidence artifact (BENCH_FULL.json certs,
checksum legs), so the helpers that produce that evidence get the same
test discipline as operators: the checksum must be deterministic,
order/partitioning-independent, and sensitive to any single-row change
-- otherwise block_invariant / matches_committed prove nothing.
"""

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


@pytest.fixture()
def small_df(spark):
    return spark.range(1000).select(
        F.col("id").cast("int").alias("i"),
        (F.col("id") % 7).cast("int").alias("j"),
        (F.sin(F.col("id") * 0.1)).cast("double").alias("value"),
    )


class TestDfChecksum:
    def test_deterministic(self, spark, small_df):
        assert bench._df_checksum(small_df) == bench._df_checksum(
            small_df)

    def test_partitioning_invariant(self, spark, small_df):
        cs = bench._df_checksum(small_df)
        assert bench._df_checksum(small_df.repartition(13)) == cs
        assert bench._df_checksum(small_df.coalesce(1)) == cs

    def test_row_order_invariant(self, spark, small_df):
        cs = bench._df_checksum(small_df)
        assert bench._df_checksum(
            small_df.orderBy(F.desc("value"))) == cs

    def test_single_value_change_moves_it(self, spark, small_df):
        cs = bench._df_checksum(small_df)
        tweaked = small_df.withColumn(
            "value",
            F.when(F.col("i") == 500, F.col("value") + 1e-3)
            .otherwise(F.col("value")),
        )
        assert bench._df_checksum(tweaked) != cs

    def test_swapped_cells_move_it(self, spark, small_df):
        # order-independent sums can be blind to value swaps WITHIN a
        # column; the per-row crc couples values to their row, so
        # swapping two rows' values must move the sum
        cs = bench._df_checksum(small_df)
        swapped = small_df.withColumn(
            "j",
            F.when(F.col("i") == 0, F.lit(1))
            .when(F.col("i") == 1, F.lit(0))
            .otherwise(F.col("j")).cast("int"),
        )
        assert bench._df_checksum(swapped) != cs

    def test_dropped_row_moves_it(self, spark, small_df):
        assert bench._df_checksum(
            small_df.filter(F.col("i") != 999)
        ) != bench._df_checksum(small_df)

    def test_nan_rows_are_stable(self, spark):
        df = spark.range(10).select(
            F.col("id").cast("int").alias("i"),
            F.when(F.col("id") % 2 == 0, float("nan"))
            .otherwise(F.col("id").cast("double")).alias("value"),
        )
        assert bench._df_checksum(df) == bench._df_checksum(
            df.repartition(3))

    def test_empty_dataframe_checksums_to_zero(self, spark, small_df):
        # SUM over zero rows is NULL; the helper must return 0, not
        # abort the checksum leg with int(None)
        assert bench._df_checksum(
            small_df.filter(F.col("i") < 0)) == 0
        assert bench._df_checksum(
            spark.createDataFrame([], "a int, b double")) == 0

    def test_sub_rounding_noise_is_absorbed(self, spark, small_df):
        # floats hash at 6 dp: an ulp-level wiggle must NOT move the
        # checksum (flip risk = wiggle/1e-6 per row; 1e-12 keeps the
        # 1000-row flip probability at ~1e-6)
        cs = bench._df_checksum(small_df)
        wiggled = small_df.withColumn(
            "value", F.col("value") + F.lit(1e-12))
        assert bench._df_checksum(wiggled) == cs


class TestRssMonitor:
    """The peak-RSS evidence in BENCH_FULL's scale_100x entries must
    actually observe a worker's allocation -- otherwise the bound
    check proves nothing."""

    def test_child_allocation_is_observed(self):
        import subprocess
        import sys as _sys

        mon = bench._RssMonitor(interval=0.02).start()
        # a child that allocates ~300 MB, holds it briefly, exits
        subprocess.run([
            _sys.executable, "-c",
            "b = bytearray(300 * 1024 * 1024)\n"
            "b[::4096] = bytes(len(b[::4096]))\n"  # touch pages
            "import time; time.sleep(0.3)",
        ], check=True)
        got = mon.stop()
        assert got["n_workers_seen"] >= 1
        assert got["peak_worker_rss_mb"] is not None
        assert got["peak_worker_rss_mb"] >= 250.0

    def test_no_children_yields_none_or_small(self):
        mon = bench._RssMonitor(interval=0.02).start()
        got = mon.stop()
        # whatever transient children exist, the shape is well-formed
        assert set(got) == {"peak_worker_rss_mb", "peak_jvm_rss_mb",
                            "n_workers_seen"}
