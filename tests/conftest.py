import pytest

from readability_scanner_spark.config import build_session


@pytest.fixture(scope="session")
def spark():
    session = build_session(
        app_name="rss-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    yield session
    session.stop()
