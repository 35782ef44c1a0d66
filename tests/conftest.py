import pytest

from mod_reservoir_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def warehouse(spark, tmp_path):
    from mod_reservoir_spark.core.storage import Warehouse

    return Warehouse(spark, str(tmp_path / "wh"))
