import pytest

from seraster_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs(spark):
    from seraster_spark import fixtures

    return fixtures.documents_df(spark, n=2000, seed=42).cache()


@pytest.fixture(scope="session")
def docs_pdf():
    from seraster_spark import fixtures

    return fixtures.documents_pdf(n=2000, seed=42)
