from __future__ import annotations

import shutil
import tempfile

import pytest

from axora_spark.catalog import SnapshotCatalog
from axora_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("axora-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture()
def catalog():
    d = tempfile.mkdtemp(prefix="axora_wh_")
    yield SnapshotCatalog(d)
    shutil.rmtree(d, ignore_errors=True)
