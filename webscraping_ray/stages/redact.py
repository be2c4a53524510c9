"""PII redaction stage: regex rewrite of emails / phone numbers.

A first-class training-data-pipeline component (the C4 / FineWeb /
Dolma pipelines all ship a PII pass): documents are rewritten with
every email address and phone number replaced by a placeholder token,
and per-document redaction counts are emitted for pipeline audit.

The patterns are deliberately RE2-compatible (no backreferences, no
lookaround) so the DuckDB oracle applies the *same* regexes with
``regexp_replace(..., 'g')`` — the check is a true dual implementation
(Python ``re`` vs RE2), not a replayed constant.  Covered forms:

- plain emails      ``user@example.com``
- obfuscated emails ``user0 AT example DOT com`` (the reference's
  de-obfuscation target, alg.py:29-65 — the same corpus convention the
  ``extract_contacts`` kernel decodes)
- US-style phones   ``(555) 010-1234`` / ``555-010-1234``

Embarrassingly parallel per-document kernel — compiled once per
process (module scope), no shuffle, no state.
"""
from __future__ import annotations

import re

import pyarrow as pa

#: replacement placeholders (single tokens so token counts stay sane)
EMAIL_TOKEN = '<EMAIL>'
PHONE_TOKEN = '<PHONE>'

#: obfuscated 'a AT b DOT tld' form — matched BEFORE the plain form so
#: the plain pattern can never bite a fragment of it (they are disjoint
#: anyway: the obfuscated form contains no '@')
OBF_EMAIL_RE = re.compile(
    r'[A-Za-z0-9._%+-]+ AT [A-Za-z0-9-]+ DOT [A-Za-z]{2,}')
PLAIN_EMAIL_RE = re.compile(
    r'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
PHONE_RE = re.compile(r'\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}')

#: the same patterns as RE2 source strings for the DuckDB oracle
OBF_EMAIL_SQL = '[A-Za-z0-9._%+-]+ AT [A-Za-z0-9-]+ DOT [A-Za-z]{2,}'
PLAIN_EMAIL_SQL = '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'
PHONE_SQL = '\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}'


def redact_text(text: str) -> tuple[str, int, int]:
    """Redact one document; returns (redacted, n_emails, n_phones).

    Counts are taken on the ORIGINAL text per pattern (the patterns
    are mutually non-overlapping), replacement is sequential — the
    exact composition the oracle's nested ``regexp_replace`` applies.
    """
    t = text or ''
    n_emails = len(OBF_EMAIL_RE.findall(t)) + len(PLAIN_EMAIL_RE.findall(t))
    n_phones = len(PHONE_RE.findall(t))
    t = OBF_EMAIL_RE.sub(EMAIL_TOKEN, t)
    t = PLAIN_EMAIL_RE.sub(EMAIL_TOKEN, t)
    t = PHONE_RE.sub(PHONE_TOKEN, t)
    return t, n_emails, n_phones


class RedactPII:
    """map_batches stage: (id, text) → (id, redacted, counts)."""

    def __init__(self, text_col: str = 'text', id_col: str = 'doc_id',
                 out_col: str = 'text_redacted'):
        self.text_col = text_col
        self.id_col = id_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, ne, np_ = [], [], []
        for t in batch.column(self.text_col).to_pylist():
            r, e, p = redact_text(t)
            out.append(r)
            ne.append(e)
            np_.append(p)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            self.out_col: pa.array(out, pa.string()),
            'n_emails': pa.array(ne, pa.int64()),
            'n_phones': pa.array(np_, pa.int64()),
        })
