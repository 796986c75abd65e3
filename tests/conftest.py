from __future__ import annotations

import pandas as pd
import pytest

from hdata_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hdata_spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_cfg():
    from hdata_spark.fixtures import CDCFixtureConfig

    return CDCFixtureConfig(
        seed=42,
        n_repos=12,
        paths_per_repo=20,
        hot_repos=1,
        hot_factor=15,
        n_events=2_000,
        epoch_size=500,
        base_rows=150,
    )


@pytest.fixture(scope="session")
def small_fixture(small_cfg):
    from hdata_spark.fixtures import generate_base, generate_events

    return generate_base(small_cfg), generate_events(small_cfg)


def assert_state_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    """Set-equality on (repo, path, commit, lang, sha256(content))."""
    from hdata_spark.fixtures import sha256_fingerprint

    assert sha256_fingerprint(actual) == sha256_fingerprint(expected), (
        f"final-state mismatch: {len(actual)} vs {len(expected)} rows;\n"
        f"actual head:\n{actual.head()}\nexpected head:\n{expected.head()}"
    )
