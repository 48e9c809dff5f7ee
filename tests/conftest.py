import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from chronographer_spark.session import get_spark

    s = get_spark(app_name="chronographer-tests", master="local[4]", shuffle_partitions=8)
    yield s
