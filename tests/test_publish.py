"""Release pipeline (plans/publish.py): curate → expectation gate →
versioned publish, with the gate refusing to publish a broken curation."""

from __future__ import annotations

import pytest

from vmware_sd_wan_velocloud_bi_intake_spark.plans.expectations import (
    ExpectationError,
)
from vmware_sd_wan_velocloud_bi_intake_spark.plans.publish import (
    publish_curated_version,
)
from vmware_sd_wan_velocloud_bi_intake_spark.sinks import versioned
from vmware_sd_wan_velocloud_bi_intake_spark.sources.tables import load_table


def test_publish_then_pin_then_republish(spark, tmp_path, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    root = str(tmp_path / "corpus")
    v1 = publish_curated_version(docs, root, note="first release")
    assert v1 == 1
    pinned_rows = versioned.read_version(spark, root, v1).count()
    assert pinned_rows > 0
    v2 = publish_curated_version(docs, root, note="second release")
    assert v2 == 2
    # the pinned version is untouched by the republish
    assert versioned.read_version(spark, root, v1).count() == pinned_rows
    notes = [m["note"] for m in versioned.list_versions(root)]
    assert notes == ["first release", "second release"]


def test_gate_failure_publishes_nothing(spark, tmp_path, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    root = str(tmp_path / "gated")
    with pytest.raises(ExpectationError, match="min_rows"):
        publish_curated_version(
            docs,
            root,
            rules=[{"column": "doc_id", "min_rows": 10_000_000}],
        )
    assert versioned.latest_version(root) is None
    assert versioned.list_versions(root) == []
