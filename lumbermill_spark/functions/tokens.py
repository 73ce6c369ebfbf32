"""Token-array <-> string views.

The pipeline input (BASELINE.json input_hint) is a table of pre-tokenized
sequences: ``tokens: array<int32>`` where each token is a byte of the
UTF-8 "log line" the event carries (the Spark analog of LumberMill's
``event['data']`` raw payload, /root/reference/lumbermill/utils/DictUtils.py:176-189).

Two decode paths:

- ``decode_tokens`` — pure JVM expression (``transform`` + ``char`` +
  ``array_join``): zero Python, whole-stage-codegen'd. Correct for ASCII
  payloads (our synthetic corpus is ASCII by construction).
- pandas-UDF consumers (the Arrow regex engine) decode
  ``bytes(arr).decode('utf-8')`` per Arrow batch, which is correct for
  arbitrary UTF-8. Both agree on ASCII.

Nothing here mutates ``tokens``: the BASELINE invariant is exact
token-array pass-through per doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decode_tokens(tokens: Column | str) -> Column:
    """array<int> of byte values -> string (ASCII-safe JVM fast path)."""
    col = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.array_join(F.transform(col, lambda t: F.char(t)), "")


def encode_line(line: Column | str) -> Column:
    """string -> array<int> of character codes (ASCII-safe JVM path).

    Inverse of decode_tokens for ASCII payloads; used by the synthetic
    generator so token synthesis stays JVM-side.
    """
    col = F.col(line) if isinstance(line, str) else line
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    return F.transform(chars, lambda c: F.ascii(c))
