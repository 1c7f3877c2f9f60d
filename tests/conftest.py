import pytest

from bullet_storm_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="bullet-storm-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/bss-warehouse"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_tables(spark):
    """sf0.001 driver tables registered as temp views."""
    from bullet_storm_spark.sources.tables import load_tables

    return load_tables(spark, "/root/testdata/sf0.001")
