"""PII detection/redaction patterns (north-star extension; the
reference pipeline has no PII handling — this is training-data-curation
surface, SURVEY.md §2.9).

Own module (not functions/text.py) so the window-policy dependency
closure of a PII edit is the pii_scan/pii_redact pair, not every
text-consuming query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared (verbatim) by the pii_scan/pii_redact harness oracles — keep
# RE2-safe so the same strings run under Java regex (Spark codegen)
# and DuckDB's RE2 with identical matches.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{3}[-. ]\d{3,4}[-. ]\d{4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(col: Column | str) -> Column:
    """Replace every email/phone/IPv4 match with a typed placeholder
    (``<EMAIL>``/``<PHONE>``/``<IPV4>``) — the redaction step the
    pii_scan counts are the signal for. Applied in PII_PATTERNS
    insertion order (email before phone before ipv4; order is part of
    the contract since an email's host can contain digit runs). Pure
    scan-local codegen'd regexp_replace chain — zero shuffle, and
    idempotent: placeholders contain no pattern-matchable characters,
    so redacting twice equals redacting once."""
    c = F.col(col) if isinstance(col, str) else col
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{kind.upper()}>")
    return c
