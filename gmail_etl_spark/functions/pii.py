"""PII detection / redaction column kernels (X3 extension surface).

A large-scale training-data pipeline scrubs personally identifiable
information before anything else touches the corpus (public practice:
C4/Dolma/RefinedWeb pipelines all carry a PII pass).  These are pure
JVM-side column expressions — ``regexp_replace`` / ``regexp_count``
inside whole-stage codegen, no Python in the hot path — so the pass is
a narrow map over the scan at any scale.

Patterns are deliberately dialect-neutral (valid and identical under
Java regex and RE2) so the DuckDB oracles can recompute them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: dialect-neutral patterns (Java regex == RE2 semantics for these)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"


def redact_text(col: Column) -> Column:
    """Replace emails / phones / SSNs with typed placeholder tags.

    Order matters: the 3-3-4 phone shape is replaced before the 3-2-4
    SSN shape so neither rewrite can create a spurious match for the
    other; emails go first because their local part may contain digits.
    """
    out = F.regexp_replace(col, EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, PHONE_RE, "[PHONE]")
    return F.regexp_replace(out, SSN_RE, "[SSN]")


def with_pii_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII scrub: match counts + redacted text.

    Scale posture: four regex passes over one column, all codegen'd into
    the same stage as the scan — no shuffle, no UDF."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)),
            "n_phones": F.regexp_count(c, F.lit(PHONE_RE)),
            "n_ssns": F.regexp_count(c, F.lit(SSN_RE)),
            "clean_text": redact_text(c),
        }
    )
