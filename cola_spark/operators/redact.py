"""PII redaction: scrub emails, IPv4 addresses and phone numbers.

Standard training-corpus hygiene (the C4/RefinedWeb cleaning family):
contact strings are replaced with typed placeholders before text ships
to a trainer. No reference analogue — cola (SURVEY.md §2) never looks
inside page text.

All patterns live in the Java-regex ∩ RE2 subset (no lookaround, no \\p
classes) so DuckDB reproduces the scrub byte-for-byte and the whole
operator is SQL-oracle-able. Redaction is SEQUENTIAL — emails, then
IPv4, then phones — because the broad phone pattern (digit runs with
separators) would otherwise also match IPs and email digits; each
stage counts on its own input, so the counts are well-defined and
engine-identical. Pure column expressions: map-side, zero shuffle,
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"


def redact_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, clean_text): typed PII counts
    and the scrubbed text ([EMAIL]/[IP]/[PHONE] placeholders)."""
    t0 = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t0, F.lit(EMAIL_RE), 0)).cast("long")
    t1 = F.regexp_replace(t0, EMAIL_RE, "[EMAIL]")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(IPV4_RE), 0)).cast("long")
    t2 = F.regexp_replace(t1, IPV4_RE, "[IP]")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PHONE_RE), 0)).cast("long")
    t3 = F.regexp_replace(t2, PHONE_RE, "[PHONE]")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
        t3.alias("clean_text"),
    )
