import os
import sys

import pytest

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

# Derandomize ALL hypothesis property tests: the suite is a gate, and
# a gate must be reproducible run-to-run.  Registering + loading the
# profile here (conftest imports before test modules) makes every
# @settings(...) decorator inherit derandomize=True for fields it
# doesn't set explicitly.
try:
    from hypothesis import settings as _hyp_settings

    _hyp_settings.register_profile("deterministic", derandomize=True)
    _hyp_settings.load_profile("deterministic")
except ImportError:  # pragma: no cover
    pass


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("xcube-resampling-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.default.parallelism", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
