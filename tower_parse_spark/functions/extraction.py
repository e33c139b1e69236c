"""Regex projection: named-capture-group extraction as a Catalyst plan.

The reference's single hot-path operator is ``Parser.extract``
(readport.py:328-369): match a configured regex with named groups against a
raw line, drop ``///`` sentinels and non-participating groups, cast every
variable to float (group key to its declared type), skip malformed records.

Spark-first re-expression — all plan-time, zero Python per row:

- each variable becomes ``regexp_extract(line, pattern, idx)`` (JVM-side,
  whole-stage-codegen'd); group *names* are resolved to indices at plan
  time via Python's ``re`` groupindex, so the executed pattern carries no
  engine-specific named-group syntax (portable to the DuckDB oracle);
- alternation branches (reference needs the third-party ``regex`` module
  for same-name groups, readport.py:12-16) compile to per-column
  ``COALESCE`` over per-branch extracts (SURVEY.md §2.A9);
- sentinel ``///`` and non-participating groups (readport.py:348-351)
  become NULL via ``nullif`` — a documented divergence: the reference drops
  the dict key and later *skips* the whole record on schema mismatch
  (readport.py:258-262); NULL is strictly more information-preserving
  (SURVEY.md §7.4);
- malformed records (no branch matches / cast failure, readport.py:353-364)
  are routed, not dropped silently: ``extract_lines`` emits a ``_corrupt``
  flag so callers either filter or side-output them (PERMISSIVE-mode
  semantics, SURVEY.md §2.A12).

At 100 TB this stays a single scan + project: no shuffle, no UDF; the regex
work is N ``regexp_extract`` calls per row executed inside codegen. If a
profile shows pathological patterns, the escape hatch is a one-pass
struct-returning parse via ``from_csv`` or a Pandas UDF — not needed for
the reference's formats.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tower_parse_spark.plans.profile import DeviceProfile

_NAMED_GROUP = re.compile(r"\(\?P<([A-Za-z_][A-Za-z0-9_]*)>")


def unnamed_pattern(branch: str) -> str:
    """Strip Python named-group syntax so the pattern runs identically on
    the JVM (Spark) and RE2 (DuckDB): ``(?P<v>...)`` -> ``(...)``."""
    return _NAMED_GROUP.sub("(", branch)


def group_indices(branch: str) -> dict[str, int]:
    """Resolve capture-group names to 1-based indices at plan time
    (the runtime analog of readport.py:610-620's groupindex use)."""
    return dict(re.compile(branch).groupindex)


def _extract_one(line: Column, branch: str, var: str, sentinel: str) -> Column:
    """One variable from one branch: extract -> ''/sentinel -> NULL."""
    idx = group_indices(branch)[var]
    raw = F.regexp_extract(line, unnamed_pattern(branch), idx)
    # '' covers both "branch did not match" and "group did not participate"
    # (regexp_extract returns '' in either case); the sentinel covers the
    # device's explicit missing-value marker (readport.py:348-351).
    return F.nullif(F.nullif(raw, F.lit("")), F.lit(sentinel))


def extraction_columns(
    profile: DeviceProfile, line_col: str = "line"
) -> dict[str, Column]:
    """Typed extraction expressions for every profile variable.

    Multi-branch profiles coalesce per-variable across branches — first
    matching branch wins, mirroring leftmost-alternation semantics of the
    reference's unified pattern (tests/test_parser.py:75-100).
    Casts: every variable -> double (readport.py:324-325); the group key ->
    its declared int/double/string (readport.py:169, 326). A cast failure
    yields NULL (Spark semantics) and is surfaced through ``_corrupt``
    routing by ``extract_lines``.
    """
    line = F.col(line_col)
    out: dict[str, Column] = {}
    for var in profile.variables:
        branches = [
            _extract_one(line, b, var, profile.sentinel)
            for b in profile.regex
            if var in group_indices(b)
        ]
        expr = branches[0] if len(branches) == 1 else F.coalesce(*branches)
        # try_cast, not cast: under ANSI mode (Spark 4 default) a plain cast
        # on a malformed capture kills the whole job; the reference treats
        # cast failure as a record-level error (readport.py:353-364) and the
        # engine's documented divergence maps that to NULL (SURVEY.md §7.4).
        if profile.group is not None and var == profile.group.var:
            expr = expr.try_cast(profile.group.spark_type)
        else:
            expr = expr.try_cast("double")
        out[var] = expr.alias(var)
    return out


def matches_any_branch(profile: DeviceProfile, line_col: str = "line") -> Column:
    """True when at least one regex branch matches the raw line."""
    line = F.col(line_col)
    cond = None
    for branch in profile.regex:
        c = line.rlike(unnamed_pattern(branch))
        cond = c if cond is None else (cond | c)
    return cond


def extract_lines(
    df: DataFrame,
    profile: DeviceProfile,
    line_col: str = "line",
    time_col: str = "ts",
    keep_corrupt: bool = False,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Project a raw-lines DataFrame into the typed schema.

    Output columns: ``time`` (carried from *time_col* — the reference
    stamps processing time at receipt, readport.py:449-453; batch replays
    carry the recorded timestamp), every profile variable (typed), plus
    ``_corrupt`` when *keep_corrupt* — otherwise malformed lines are
    filtered out (the reference skips them, readport.py:490-494).
    """
    cols = extraction_columns(profile, line_col)
    matched = matches_any_branch(profile, line_col)
    projected = [F.col(time_col).alias("time"), *cols.values()]
    if extra_cols:
        projected = [F.col(c) for c in extra_cols] + projected
    if keep_corrupt:
        return df.select(*projected, (~matched).alias("_corrupt"))
    return df.filter(matched).select(*projected)
