import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_TESTS = "/root/reference/test"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("tsp-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def load_reference_corpus(test_file: str) -> str:
    """Extract the corpus literal from a reference pgTAP test file at runtime
    (keeps third-party corpus text out of this repo)."""
    path = os.path.join(REFERENCE_TESTS, test_file)
    with open(path, encoding="utf-8") as fh:
        src = fh.read()
    m = re.search(r"INSERT INTO _files VALUES\s*\('((?:[^']|'')*)'\)", src)
    if not m:
        raise ValueError(f"no corpus found in {test_file}")
    return m.group(1).replace("''", "'")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_TESTS)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference corpus not available")
