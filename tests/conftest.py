import pytest

from mopper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mopper-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    # keep the session alive across the whole test run; stop at exit
    s.stop()


def normalize_statements(lines):
    """The reference's golden-compare contract (tests.rs:52-66): drop blank
    and comment lines, collapse runs of whitespace, compare as a set."""
    out = set()
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        out.add(" ".join(line.split()))
    return out
