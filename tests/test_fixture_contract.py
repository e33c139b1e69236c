"""Fixture-contract canary: the driver regenerates /root/testdata between
rounds and has already changed a physical type once (events.ts, round 2 —
see tests/test_fixture_shapes.py). This test pins the COLUMN/TYPE contract
every registered query assumes, per table, so any future regeneration that
drifts the schema fails here first with a named column instead of deep in
some query's analysis error.

Types are asserted on the *loaded* DataFrame (post ``load_table``
normalization), against a coarse contract — exact integer widths are
allowed to drift (int32 vs int64 both satisfy "integral") because Spark
queries here never depend on width.
"""

from __future__ import annotations

import os

import pytest

from tower_parse_spark.session import TABLES, load_table, table_path

SF_DIR = "/root/testdata/sf0.001"

_INTEGRAL = {"int", "bigint", "smallint", "tinyint"}

#: column -> acceptable loaded dtypes (None = any); every column listed is
#: REQUIRED to exist. Extra columns in a fixture are fine.
CONTRACT: dict[str, dict[str, set[str] | None]] = {
    "region": {"r_regionkey": _INTEGRAL, "r_name": {"string"}},
    "nation": {
        "n_nationkey": _INTEGRAL,
        "n_name": {"string"},
        "n_regionkey": _INTEGRAL,
    },
    "customer": {
        "c_custkey": _INTEGRAL,
        "c_name": {"string"},
        "c_nationkey": _INTEGRAL,
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": _INTEGRAL,
        "s_name": {"string"},
        "s_nationkey": _INTEGRAL,
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": _INTEGRAL,
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": _INTEGRAL,
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": _INTEGRAL,
        "o_custkey": _INTEGRAL,
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        # date-like: queries hop-cast via cast("timestamp") so NTZ or TZ
        # micros both work (temporal.py:225 pattern)
        "o_orderdate": {"timestamp", "timestamp_ntz", "date"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": _INTEGRAL,
        "l_partkey": _INTEGRAL,
        "l_suppkey": _INTEGRAL,
        "l_linenumber": _INTEGRAL,
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"timestamp", "timestamp_ntz", "date"},
    },
    "events": {
        "event_id": _INTEGRAL,
        # post-normalize_event_ts this MUST be session-tz timestamp,
        # whatever physical shape the parquet carries
        "ts": {"timestamp"},
        "user_id": _INTEGRAL,
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": _INTEGRAL,
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": _INTEGRAL,
    },
    "embeddings": {
        "vec_id": _INTEGRAL,
        "embedding": {"array<float>", "array<double>"},
        "label": _INTEGRAL,
    },
}


@pytest.mark.parametrize("name", TABLES)
def test_fixture_contract(spark, name):
    assert name in CONTRACT, f"table {name} has no contract entry"
    path = table_path(SF_DIR, name)
    assert os.path.exists(path), f"fixture missing: {path}"
    df = load_table(spark, SF_DIR, name)
    dtypes = dict(df.dtypes)
    for col, allowed in CONTRACT[name].items():
        assert col in dtypes, (
            f"{name}.{col} missing from regenerated fixture "
            f"(has: {sorted(dtypes)})"
        )
        if allowed is not None:
            assert dtypes[col] in allowed, (
                f"{name}.{col} drifted to {dtypes[col]!r} "
                f"(contract allows {sorted(allowed)}) — check "
                "session.load_table normalization"
            )
    assert df.count() > 0, f"{name} fixture is empty"


def test_fixture_ids_below_synthesis_offsets(spark):
    """The synthetic-augmentation offsets assume raw fixture ids never
    reach them (ADVICE r7): queries/filtering.py plants OOV documents at
    doc_id + PPL_UNK_OFFSET and eval embeddings at vec_id +
    _EVAL_ID_OFFSET, and the oracles split raw-vs-planted rows with
    `id < offset` predicates over the augmented union — an id at or
    above an offset would silently diverge the two engines (and a
    planted id could collide with a raw one). Pin the headroom at every
    on-disk sf so a regenerated fixture that breaks the assumption
    fails HERE with a named constant, not as a hash mismatch.
    """
    import glob

    from pyspark.sql import functions as F

    from tower_parse_spark.queries import filtering as FL

    sf_dirs = sorted(glob.glob("/root/testdata/sf*"))
    assert sf_dirs, "no testdata fixtures on disk"
    for sf_dir in sf_dirs:
        docs_max = (
            load_table(spark, sf_dir, "documents")
            .agg(F.max("doc_id"))
            .collect()[0][0]
        )
        vec_max = (
            load_table(spark, sf_dir, "embeddings")
            .agg(F.max("vec_id"))
            .collect()[0][0]
        )
        # strict headroom: even doc_id + offset (the planted id) must not
        # collide with another planted id's raw origin, which holds as
        # long as raw ids stay below the SMALLEST offset in play
        assert docs_max < FL._EVAL_ID_OFFSET, (
            f"{sf_dir}: max doc_id {docs_max} >= _EVAL_ID_OFFSET"
        )
        assert docs_max < FL.PPL_UNK_OFFSET, (
            f"{sf_dir}: max doc_id {docs_max} >= PPL_UNK_OFFSET"
        )
        assert docs_max < FL.QC_SPAM_OFFSET, (
            f"{sf_dir}: max doc_id {docs_max} >= QC_SPAM_OFFSET"
        )
        assert vec_max < FL._EVAL_ID_OFFSET, (
            f"{sf_dir}: max vec_id {vec_max} >= _EVAL_ID_OFFSET"
        )
