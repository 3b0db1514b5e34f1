from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from vcf2parquet_spark.session import get_spark
    s = get_spark(cores=4, app_name="vcf2parquet_spark_tests",
                  shuffle_partitions=4)
    yield s
    s.stop()
