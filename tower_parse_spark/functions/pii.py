"""PII detection/redaction primitives for training-data pipelines.

Scrubbing personally identifiable information (emails, phone numbers,
IP addresses) is a standard pre-training corpus step. All primitives are
pure JVM-side ``regexp_*`` expressions — no Python in the hot path — so
a 100 TB documents table runs them inside the parquet scan projection,
exactly like the text-analysis family (functions/text.py).

The patterns stay in the RE2-compatible subset (no lookarounds, no
backreferences) so the DuckDB oracle executes the *identical* pattern:
Java regex and RE2 agree on these constructs byte-for-byte.

Reference context: the reference has no PII surface (it ingests sensor
floats); this module belongs to the training-data extension surface
BASELINE.json directs alongside dedup/similarity/text analysis.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: RE2-safe patterns, ordered: emails first (their local parts contain
#: digits that the phone pattern could otherwise nibble), then IPs
#: (dotted digits the phone pattern ignores anyway), then phones.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
IP_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d{1,2}[-\s]?\(?\d{3}\)?[-\s]?\d{3}[-\s]?\d{4}"

#: replacement tags — greppable, single-token, never re-match a pattern
TAGS = {"email": "<EMAIL>", "ip": "<IP>", "phone": "<PHONE>"}

_ORDERED = [("email", EMAIL_RE), ("ip", IP_RE), ("phone", PHONE_RE)]


def redact_pii(text: Column) -> Column:
    """Replace every email, IP and phone match with its tag.

    One ``regexp_replace`` per category (3 regex executions per row,
    all inside whole-stage codegen). Application order matters and is
    fixed: email -> IP -> phone (see pattern notes above).
    """
    out = text
    for kind, pat in _ORDERED:
        out = F.regexp_replace(out, pat, TAGS[kind])
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (regexp_count, JVM-side)."""
    return {
        f"n_{kind}s": F.regexp_count(text, F.lit(pat))
        for kind, pat in _ORDERED
    }


# ---- SQL twins (DuckDB dialect; identical patterns, 'g' flag because
# DuckDB's regexp_replace is first-match-only by default) -------------------


def sql_redact(expr: str) -> str:
    out = expr
    for kind, pat in _ORDERED:
        out = (
            f"regexp_replace({out}, '{pat}', '{TAGS[kind]}', 'g')"
        )
    return out


def sql_counts(expr: str) -> dict[str, str]:
    return {
        f"n_{kind}s": f"len(regexp_extract_all({expr}, '{pat}'))"
        for kind, pat in _ORDERED
    }
