"""r14 ADVICE: SPARK_GRAFT_INITIAL_SHUFFLE_PARTITIONS must fail fast at
read time with a clear error, not at first query with an opaque Spark
conf error."""

from __future__ import annotations

import pytest

from fdi_flow_spark.core.session import get_spark


@pytest.mark.parametrize("bad", ["abc", "-3", "0", "1.5"])
def test_initial_shuffle_partitions_validated(monkeypatch, bad, spark):
    monkeypatch.setenv("SPARK_GRAFT_INITIAL_SHUFFLE_PARTITIONS", bad)
    with pytest.raises(ValueError, match="SPARK_GRAFT_INITIAL_SHUFFLE_PARTITIONS"):
        get_spark(app_name="conf-check")


def test_initial_shuffle_partitions_valid_passthrough(monkeypatch, spark):
    # a valid value must not raise (the live session already exists, so
    # the config is a no-op here — the wiring itself is one builder line)
    monkeypatch.setenv("SPARK_GRAFT_INITIAL_SHUFFLE_PARTITIONS", "128")
    assert get_spark(app_name="conf-check") is not None
