from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import settings as hyp_settings  # noqa: E402

from uk_housing_dashboard_etl_spark.session import get_spark  # noqa: E402

# Round-8 verdict item 4: "pytest N/N green" round-close claims must be
# REPRODUCIBLE. The default profile keeps fresh random draws (that is
# how the _word_shingles empty-doc bug was found); close-gate runs use
# the derandomized profile so the same commit always produces the same
# verdict:  HYPOTHESIS_PROFILE=close python -m pytest tests/
hyp_settings.register_profile("close", derandomize=True)
hyp_settings.register_profile("default")
hyp_settings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "default"))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med() -> str:
    return SF_MED
