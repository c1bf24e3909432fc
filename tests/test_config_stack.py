"""Both config-schema generations (v2 flat firewall vs v3 segmented) must
produce correct summaries from the SAME superset schema — the SURVEY.md §7
risk-register item ('dual-schema configs: easy to get subtly wrong — test
both generations')."""

from __future__ import annotations

import json

from vmware_sd_wan_velocloud_bi_intake_spark.plans.config_stack import (
    config_stack_summary,
)

V2_STACK = [
    {
        "name": "Edge Specific Profile",
        "schemaVersion": "2.0.0",
        "modules": [
            {
                "name": "firewall",
                "data": {
                    "enabled": None,  # edge-specific unset → profile wins
                    "stateful": True,
                    "inbound": [{"name": "r1", "appid": 1}],
                    "outbound": [{"name": "r2", "appid": 2}, {"name": "r3", "appid": 3}],
                },
            },
            {"name": "QOS", "data": {"rules": [{"name": "q1", "appid": -1}]}},
        ],
    },
    {
        "name": "base",
        "schemaVersion": "2.0.0",
        "modules": [
            {"name": "firewall", "data": {"enabled": False, "stateful": None}},
            {
                "name": "deviceSettings",
                "data": {"snmp": {"snmpv3": {"enabled": True}}},
            },
        ],
    },
]

V3_STACK = [
    {
        "name": "Edge Specific Profile",
        "schemaVersion": "3.0.0",
        "modules": [
            {
                "name": "firewall",
                "data": {
                    "enabled": True,
                    "stateful": False,
                    "segments": [
                        {
                            "segmentId": 0,
                            "inbound": [{"name": "a", "appid": 1}],
                            "outbound": [],
                        },
                        {
                            "segmentId": 1,
                            "inbound": [{"name": "b", "appid": 2}, {"name": "c", "appid": 3}],
                            "outbound": [{"name": "d", "appid": 4}],
                        },
                    ],
                },
            },
            {
                "name": "QOS",
                "data": {
                    "rules": [{"name": "flat", "appid": -1}],
                    "segments": [
                        {"segmentId": 0, "rules": [{"name": "s1", "appid": 9}]},
                        {"segmentId": 1, "rules": [{"name": "s2", "appid": 9}, {"name": "s3", "appid": 9}]},
                    ],
                },
            },
            {
                "name": "deviceSettings",
                "data": {"snmp": {"snmpv3": {"enabled": False}}},
            },
        ],
    },
    {
        "name": "base",
        "schemaVersion": "3.0.0",
        "modules": [
            {
                "name": "deviceSettings",
                "data": {"snmp": {"snmpv3": {"enabled": True}}},
            }
        ],
    },
]


def _summary(spark, stack):
    df = spark.createDataFrame(
        [(1, json.dumps(stack))], "edge_id int, config_stack string"
    )
    return config_stack_summary(df).collect()[0]


def test_v2_flat_firewall_generation(spark):
    row = _summary(spark, V2_STACK)
    assert row["schema_version"] == "2.0.0"
    # edge profile: 1 in + 2 out; base profile: no arrays → 0
    assert row["fw_rule_count"] == 3
    # enabled: edge unset (null) → base profile False (F27 coalesce)
    assert row["fw_enabled"] is False
    # stateful: edge True wins
    assert row["fw_stateful"] is True
    # snmp only on base profile → fallback (F26)
    assert row["snmpv3_enabled"] is True
    # QOS: 1 flat rule, no segments
    assert row["n_policies"] == 1


def test_v3_segmented_firewall_generation(spark):
    row = _summary(spark, V3_STACK)
    assert row["schema_version"] == "3.0.0"
    # v3 counts per-segment: (1+0) + (2+1) = 4; base has no firewall module
    assert row["fw_rule_count"] == 4
    assert row["fw_enabled"] is True
    assert row["fw_stateful"] is False
    # edge-level snmp present → edge wins over base (F26 precedence)
    assert row["snmpv3_enabled"] is False
    # QOS: 1 flat + (1 + 2) per-segment
    assert row["n_policies"] == 4


def test_v2_payload_through_v3_branch_is_zero_not_error(spark):
    # a v3-tagged stack whose firewall data carries only v2 fields must not
    # crash or miscount — the v3 branch sees NULL segments → 0
    stack = [dict(V2_STACK[0], schemaVersion="3.0.0"), V2_STACK[1]]
    row = _summary(spark, stack)
    assert row["fw_rule_count"] == 0
    assert row["n_policies"] == 1


def test_missing_modules_and_profiles_are_null_safe(spark):
    row = _summary(spark, [{"name": "only", "schemaVersion": "2.0.0", "modules": []}])
    assert row["fw_rule_count"] == 0
    assert row["fw_enabled"] is None
    assert row["snmpv3_enabled"] is None
    assert row["n_policies"] == 0
