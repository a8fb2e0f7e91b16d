import pytest

from import_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("import-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
