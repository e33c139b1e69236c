"""The mechanical plan-drift rule (VERDICT r13 #5): a deferred query
whose optimized plan changed since the committed PLAN_DIGESTS.json must
turn rotation_check red — plan rewrites ride IN the driver window."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tools import plan_digest as PD
from tools.rotation_check import plan_drift


def test_normalize_strips_run_varying_noise():
    s = (
        "Project [l_orderkey#123, sum#4567L]\n"
        "+- Relation [l_orderkey#123] parquet, "
        "file:/tmp/blah-8f3a/out <PATH-ish> /root/testdata/sf0.001/x "
        "obj@deadbeef42"
    )
    t = (
        "Project [l_orderkey#9, sum#88L]\n"
        "+- Relation [l_orderkey#9] parquet, "
        "file:/tmp/other-1111/zzz <PATH-ish> /root/testdata/sf0.001/x "
        "obj@aaaa990011"
    )
    assert PD.normalize_plan(s) == PD.normalize_plan(t)


def test_digest_stable_across_rebuilds_and_moves_with_the_plan(spark):
    """Two independent builds of the same query digest identically;
    a genuinely different plan digests differently."""
    from tower_parse_spark.queries import registry

    reg = registry()
    sf = "/root/testdata/sf0.001"
    d1 = PD.plan_digest(reg["q1_pricing_summary"].fn(spark, sf))
    d2 = PD.plan_digest(reg["q1_pricing_summary"].fn(spark, sf))
    assert d1 == d2
    changed = reg["q1_pricing_summary"].fn(spark, sf).filter(
        F.lit(True) & (F.col("sum_qty") > 0)
    )
    assert PD.plan_digest(changed) != d1


def test_plan_drift_red_on_changed_deferred_green_on_match(spark, tmp_path):
    """The done condition: red on a synthetic plan-changed+deferred
    case, green when the record matches, loud when the record is
    missing."""
    names = ["q1_pricing_summary", "q6_forecast_revenue"]
    window = {"q1_pricing_summary"}  # q6 is the deferred one

    # current truth for the deferred query
    true_digest = PD.compute_digests(
        spark, names=["q6_forecast_revenue"]
    )["q6_forecast_revenue"]

    rec = tmp_path / "PLAN_DIGESTS.json"
    rec.write_text(
        json.dumps({"digests": {"q6_forecast_revenue": true_digest}})
    )
    assert plan_drift(names, window, digest_path=str(rec)) == []

    rec.write_text(
        json.dumps({"digests": {"q6_forecast_revenue": "0badd1gest000000"}})
    )
    assert plan_drift(names, window, digest_path=str(rec)) == [
        "q6_forecast_revenue"
    ]

    # a deferred query ABSENT from the record is drift (stale record)
    rec.write_text(json.dumps({"digests": {}}))
    assert plan_drift(names, window, digest_path=str(rec)) == [
        "q6_forecast_revenue"
    ]

    # no record at all: every deferred query surfaces, no Spark needed
    assert plan_drift(names, window, digest_path=str(tmp_path / "nope")) == [
        "q6_forecast_revenue"
    ]


def test_committed_record_matches_current_code(spark):
    """The real registry is GREEN under the rule: every deferred
    query's current digest matches the committed PLAN_DIGESTS.json.
    (A sample, not the full tail — the full sweep is the round-close
    `rotation_check --plan-drift` run; this canary catches a stale
    commit early and cheaply.)"""
    from tower_parse_spark.queries import registry

    names = list(registry())
    deferred = names[50:]
    sample = [q for q in deferred if q.startswith(("q1", "q3", "dedup_ex"))][:3]
    with open(PD.DIGEST_FILE) as f:
        recorded = json.load(f)["digests"]
    assert set(recorded) >= set(names), "record must cover the registry"
    current = PD.compute_digests(spark, names=sample)
    for q in sample:
        assert current[q] == recorded[q], f"stale PLAN_DIGESTS entry: {q}"
