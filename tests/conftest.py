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
def docs_text(spark):
    """Small (doc_id, text) corpus with exact + near duplicates."""
    rows = [
        (i, f"shared prefix words {'x' * (i % 4)} tail {i % 7} more tokens here")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="session")
def docs_pdf():
    from seraster_spark import fixtures

    return fixtures.documents_pdf(n=2000, seed=42)
