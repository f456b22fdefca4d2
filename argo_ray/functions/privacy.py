"""PII redaction for training-data pipelines: scrub emails, phone
numbers and IPv4 addresses from a text column before the corpus ships.

No reference counterpart (kierdavis/argo has no text-cleaning surface);
this is part of the brief-mandated training-data suite.  Design:

- **Vectorized**: one ``pyarrow.compute.replace_substring_regex`` RE2
  kernel per pattern, zero per-row Python.  At 100 TB the stage is a
  stateless ``map_batches`` over zero-copy Arrow — no shuffle, no
  state, linear scale-out.
- **Oracle-exact**: the pattern constants below are RE2-only (no
  lookahead/backrefs) and are formatted verbatim into the DuckDB
  oracle (``regexp_replace(..., 'g')`` — DuckDB is RE2 too), so the
  redacted string and the per-kind counts are byte-identical on both
  sides.  Redaction order (email → phone → ip) is part of the
  contract; counts are taken on the pre-redaction text.
- **Planted PII**: the driver corpora contain no PII, so
  :func:`plant_pii_batch` deterministically appends one PII token to
  every document (kind = ``doc_id % 3``), reproduced relationally by
  :func:`plant_pii_sql`.  Production callers skip the planting stage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe (and DuckDB-identical) patterns.  Kept deliberately simple —
# these are corpus-scrubbing heuristics, not RFC validators.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+\d{1,3}( \d{2,4}){2,4}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# (output-count column, pattern, replacement) — order matters: emails
# first (an address would otherwise lose its local part to no other
# rule, but phone/ip replacement cannot create or destroy an email),
# then phones, then IPs (an IP never overlaps a already-redacted span).
REDACTION_RULES = (
    ("n_emails", EMAIL_PATTERN, "<EMAIL>"),
    ("n_phones", PHONE_PATTERN, "<PHONE>"),
    ("n_ips", IPV4_PATTERN, "<IP>"),
)


def redact_pii_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """``map_batches`` UDF: append ``clean`` (redacted text) and one
    int64 match-count column per rule.  Counts are measured on the
    input text (pre-redaction), redactions applied in rule order."""
    text = pc.cast(batch[text_column], pa.large_string())
    counts = {
        name: pc.cast(pc.count_substring_regex(text, pattern=pat), pa.int64())
        for name, pat, _ in REDACTION_RULES
    }
    clean = text
    for _, pat, rep in REDACTION_RULES:
        clean = pc.replace_substring_regex(clean, pattern=pat, replacement=rep)
    out = batch.append_column("clean", pc.cast(clean, pa.string()))
    for name, arr in counts.items():
        out = out.append_column(name, arr)
    return out


def _mod(arr, m: int):
    # pyarrow.compute has no modulo kernel; doc_id >= 0 so truncating
    # integer divide is euclidean here.
    return pc.subtract(arr, pc.multiply(pc.divide(arr, m), m))


def plant_pii_batch(batch: pa.Table) -> pa.Table:
    """Deterministically append one PII token per document — the test
    corpus for :func:`redact_pii_batch` (kind = ``doc_id % 3``).
    Vectorized: integer mod + three string-concat kernels + if_else."""
    did = pc.cast(batch["doc_id"], pa.int64())
    kind = _mod(did, 3)
    text = pc.cast(batch["text"], pa.string())
    n = len(batch)

    def lit(v: str):
        return pa.array([v] * n, pa.string())

    def join(*parts):
        return pc.binary_join_element_wise(*parts, lit(""))

    email = join(text, lit(" reach user"), pc.cast(did, pa.string()),
                 lit("@mail.example.com"))
    ip = join(text, lit(" host 10."), pc.cast(_mod(did, 200), pa.string()),
              lit(".0."), pc.cast(_mod(did, 250), pa.string()))
    phone = join(text, lit(" call +1 555 "),
                 pc.cast(pc.add(_mod(did, 900), 100), pa.string()), lit(" "),
                 pc.cast(pc.add(_mod(did, 9000), 1000), pa.string()))
    planted = pc.if_else(
        pc.equal(kind, 0), email, pc.if_else(pc.equal(kind, 1), ip, phone)
    )
    return batch.set_column(
        batch.schema.get_field_index("text"),
        "text",
        pc.cast(planted, pa.string()),
    )


def plant_pii_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`plant_pii_batch` (a CTE body)."""
    return f"""SELECT doc_id,
       text || CASE doc_id % 3
         WHEN 0 THEN ' reach user' || doc_id || '@mail.example.com'
         WHEN 1 THEN ' host 10.' || (doc_id % 200) || '.0.' || (doc_id % 250)
         ELSE ' call +1 555 ' || (100 + doc_id % 900) || ' ' || (1000 + doc_id % 9000)
       END AS text
FROM {table}"""


def redact_pii_oracle_sql() -> str:
    """Full DuckDB reconstruction: plant → count (pre-redaction) →
    redact in rule order.  Patterns are the same constants the Arrow
    kernels run, so the strings match byte-for-byte."""
    clean = "text"
    for _, pat, rep in REDACTION_RULES:
        clean = f"regexp_replace({clean}, '{pat}', '{rep}', 'g')"
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS {name}"
        for name, pat, _ in REDACTION_RULES
    )
    return f"""WITH planted AS ({plant_pii_sql()})
SELECT doc_id,
       {clean} AS clean,
       {counts}
FROM planted"""
