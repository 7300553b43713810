from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Draw-robustness policy for the randomized differentials (r11 verdict
# task 3): a falsifying example found on ANY machine is shrunk and saved
# into this directory-based example database, which is COMMITTED to the
# repo — every later run (builder, judge, driver) replays it first, so a
# "pass" can never again be a lucky draw for a previously-found bug.
# Fresh exploration stays randomized (derandomize=False, the default);
# the closing gate additionally raises the per-family example budget via
# SPARK_GRAFT_PARITY_EXAMPLES (see tests/test_properties.py).
from hypothesis import settings as _hy_settings  # noqa: E402
from hypothesis.database import DirectoryBasedExampleDatabase  # noqa: E402

_HY_DB = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".hypothesis_examples"
)
_hy_settings.register_profile(
    "repo", database=DirectoryBasedExampleDatabase(_HY_DB)
)
_hy_settings.load_profile("repo")

from cdc_stream_processor_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    yield s


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
