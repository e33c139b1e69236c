"""Quality-filtering family: Gopher rules, C4 line cleaning,
temperature domain reweighting, semantic decontamination
(operators/quality.py, sampling.py::temperature_weights,
decontam.py::flag_contaminated_semantic, queries/filtering.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tower_parse_spark.operators import quality as Q
from tower_parse_spark.operators.decontam import flag_contaminated_semantic
from tower_parse_spark.operators.sampling import temperature_weights
from tower_parse_spark.queries import filtering as FQ

SF = "/root/testdata/sf0.001"


def lines_table(spark, rows):
    """rows: list of (doc_id, [lines])"""
    return spark.createDataFrame(rows, "doc_id long, lines array<string>")


# --------------------------------------------------------------------------
# Gopher signals
# --------------------------------------------------------------------------


def test_gopher_passing_doc(spark):
    # 66 words (11 x 6) incl. 2 required stopwords, no decorations
    line = "the quick brown fox jumps with vigor over lazy dogs today"
    df = lines_table(spark, [(1, [line] * 6)])
    row = Q.gopher_signals(df).collect()[0]
    assert row.n_words == 66
    assert row.fail_reason == "pass" and row.passes
    assert row.bullet_frac == 0.0 and row.ellipsis_frac == 0.0
    assert row.alpha_frac == 1.0 and row.stop_hits == 2


def test_gopher_rule_order_and_each_rule(spark):
    base = "the quick brown fox jumps with vigor over lazy dogs today"
    sixty = [base] * 6
    cases = [
        # too few words fails first even if other rules would also fail
        (1, ["- short ..."], "words"),
        (2, ["- " + l for l in sixty], "bullet"),
        (3, [l + " ..." for l in sixty], "ellipsis"),
        # >10% symbols: a '#' per word on one line
        (4, sixty[:5] + ["# # # # # # # " + base], "symbol_ratio"),
        # digit words push alpha fraction under 0.8
        (5, [l + " 0 1 22 333 4 5 66 777" for l in sixty], "alpha"),
        # no required stopwords at all
        (6, ["quick brown fox jumps lazy dogs today here now soon"] * 6, "stopwords"),
    ]
    out = {
        r.doc_id: r
        for r in Q.gopher_signals(
            lines_table(spark, [(i, ls) for i, ls, _ in cases])
        ).collect()
    }
    for i, _, expect in cases:
        assert out[i].fail_reason == expect, (i, out[i])
        assert not out[i].passes


def test_gopher_mean_word_len_bounds(spark):
    long_words = " ".join(["extraordinarily"] * 60)  # mean len 15 > 10
    df = lines_table(spark, [(1, [long_words])])
    assert Q.gopher_signals(df).collect()[0].fail_reason == "word_len"


def test_gopher_empty_lines(spark):
    row = Q.gopher_signals(lines_table(spark, [(1, [])])).collect()[0]
    assert row.n_words == 0 and row.fail_reason == "words"
    assert row.mean_word_len == 0.0 and row.alpha_frac == 0.0


def test_gopher_null_lines_fails_closed(spark):
    # a NULL lines column NULLs every signal and every rule condition;
    # without the leading malformed rule the verdict would fall through
    # to 'pass' (fail-open — ADVICE r7). Malformed docs must FAIL.
    row = Q.gopher_signals(lines_table(spark, [(1, None)])).collect()[0]
    assert row.fail_reason == "malformed"
    assert row.passes is False


# --------------------------------------------------------------------------
# C4 line cleaning
# --------------------------------------------------------------------------


def test_clean_lines_rules(spark):
    keep = "this line has plenty of words and ends properly."
    cases = [
        (keep, True),
        ("too few words.", False),  # < 5 words
        ("this line has plenty of words but no terminal punct", False),
        ("Please enable JavaScript and cookies to continue.", False),
        ("lorem ipsum dolor sit amet and then some more.", False),
        ('{ "json": "blob with enough words to pass counts." }', False),
        ("ends with a question mark after enough words?", True),
        ('ends with a quote after plenty of words."', True),
    ]
    df = lines_table(spark, [(1, [c[0] for c in cases])])
    row = Q.line_cleaning_stats(df).collect()[0]
    expect_kept = sum(1 for _, k in cases if k)
    assert row.n_kept == expect_kept
    assert row.n_lines == len(cases)
    assert row.n_dropped == len(cases) - expect_kept
    assert row.doc_kept == (expect_kept >= Q.C4_MIN_KEPT_LINES)


def test_clean_lines_zero_survivors_chars(spark):
    row = Q.line_cleaning_stats(
        lines_table(spark, [(1, ["no punct here at all"])])
    ).collect()[0]
    assert row.n_kept == 0 and row.kept_chars == 0 and not row.doc_kept


# --------------------------------------------------------------------------
# Temperature reweighting
# --------------------------------------------------------------------------


def test_temperature_weights_math(spark):
    per = spark.createDataFrame(
        [("a", 900_000), ("b", 90_000), ("c", 10_000)],
        "source string, n_tokens long",
    )
    rows = {r.source: r for r in temperature_weights(per).collect()}
    # weights sum to 1, rates in (0, 1], most-upweighted domain at 1
    assert abs(sum(r.weight for r in rows.values()) - 1.0) < 1e-9
    assert max(r.sampling_rate for r in rows.values()) == pytest.approx(1.0)
    # alpha=0.5 flattens: smaller domains get up-weighted
    assert rows["c"].weight > rows["c"].share
    assert rows["a"].weight < rows["a"].share
    # rate is monotone-decreasing in share (downsample big domains)
    assert rows["a"].sampling_rate < rows["b"].sampling_rate <= 1.0
    # exact alpha=0.5 targets: weight_s = sqrt(share_s) / sum sqrt(share)
    import math

    shares = {"a": 0.9, "b": 0.09, "c": 0.01}
    z = sum(math.sqrt(s) for s in shares.values())
    for k, s in shares.items():
        assert rows[k].weight == pytest.approx(math.sqrt(s) / z, rel=1e-6)


def test_temperature_weights_rejects_other_alpha(spark):
    per = spark.createDataFrame([("a", 10)], "source string, n_tokens long")
    with pytest.raises(ValueError, match="alpha=0.5"):
        temperature_weights(per, alpha=0.3)


# --------------------------------------------------------------------------
# Semantic decontamination
# --------------------------------------------------------------------------


def _vec(seed, dim=8):
    return [float((seed * 31 + i * 7) % 13 - 6) for i in range(dim)]


def test_semantic_decontam_flags_planted(spark):
    corpus = spark.createDataFrame(
        [(i, _vec(i)) for i in range(1, 6)],
        "vec_id long, embedding array<double>",
    )
    # eval set = scaled copy of corpus vec 3 (cos = 1.0) + an unrelated one
    evalset = spark.createDataFrame(
        [(100, [x * 2.0 for x in _vec(3)]), (101, _vec(77))],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r
        for r in flag_contaminated_semantic(
            corpus, evalset, threshold=0.99, dim=8, planes=4
        ).collect()
    }
    assert len(out) == 5  # every corpus row gets a verdict
    assert out[3].contaminated and out[3].max_cos == pytest.approx(1.0)
    assert out[3].n_eval_matches == 1
    for i in (1, 2, 4, 5):
        assert not out[i].contaminated, out[i]
        assert out[i].max_cos < 0.99


def test_semantic_decontam_zero_norm_never_matches(spark):
    corpus = spark.createDataFrame(
        [(1, [0.0] * 8), (2, _vec(2))], "vec_id long, embedding array<double>"
    )
    evalset = spark.createDataFrame(
        [(100, [0.0] * 8)], "vec_id long, embedding array<double>"
    )
    out = {r.vec_id: r for r in flag_contaminated_semantic(
        corpus, evalset, threshold=0.5, dim=8, planes=4
    ).collect()}
    assert not out[1].contaminated and not out[2].contaminated


def test_semantic_decontam_broadcasts_eval_side(spark):
    corpus = spark.createDataFrame(
        [(i, _vec(i)) for i in range(1, 20)],
        "vec_id long, embedding array<double>",
    )
    evalset = spark.createDataFrame(
        [(100, _vec(3))], "vec_id long, embedding array<double>"
    )
    plan = (
        flag_contaminated_semantic(corpus, evalset, dim=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # candidate generation is a broadcast hash join — the vector-bearing
    # corpus is never shuffled for it. The verdict join-back is UNhinted
    # (ADVICE r7: |hits| is unbounded), so the static plan may carry one
    # SMJ over the id-only corpus projection; AQE broadcasts it at
    # runtime when hits is small.
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") <= 1


# --------------------------------------------------------------------------
# The registry queries end-to-end (fixture-scale)
# --------------------------------------------------------------------------


def test_lines_fixture_modes_fire_every_rule(spark):
    out = FQ.gopher_quality(spark, SF)
    reasons = {r.fail_reason for r in out.select("fail_reason").distinct().collect()}
    # word_len cannot fire on this fixture (token length is structurally
    # 4-5 chars); every other rule must appear
    assert {"pass", "words", "stopwords", "bullet", "ellipsis",
            "symbol_ratio", "alpha"} <= reasons


def test_line_cleaning_fixture_mixed_verdicts(spark):
    out = FQ.line_cleaning(spark, SF).collect()
    kept = [r for r in out if r.doc_kept]
    assert 0 < len(kept) < len(out)
    for r in out:
        assert r.n_kept + r.n_dropped == r.n_lines
        assert (r.kept_chars == 0) == (r.n_kept == 0)


def test_domain_reweight_fixture(spark):
    rows = FQ.domain_reweight(spark, SF).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    assert max(r.sampling_rate for r in rows) == pytest.approx(1.0, abs=1e-6)
    assert all(0 < r.sampling_rate <= 1.0 for r in rows)


def test_decontaminate_semantic_fixture_recall(spark):
    out = FQ.decontaminate_semantic(spark, SF).collect()
    flagged = {r.vec_id for r in out if r.contaminated}
    planted = {r.vec_id for r in out if r.vec_id % 10 == 7}
    # the eval set derives from vec_id % 10 == 7 — LSH blocking may miss
    # sign-flipped perturbations (documented recall tradeoff), but must
    # recover a solid majority and flag nothing else at cos >= 0.95
    assert flagged <= planted
    assert len(flagged) >= 0.6 * len(planted)
