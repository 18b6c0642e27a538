import shutil
import tempfile

import pytest

from dexspark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dexspark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_dir():
    d = tempfile.mkdtemp(prefix="dexspark_tbl_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
