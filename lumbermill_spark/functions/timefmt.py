"""strftime -> Java DateTimeFormatter pattern translation.

The reference keeps datetimes as strings and converts with
strptime/strftime (/root/reference/lumbermill/parser/DateTime.py:53-63).
Spark's to_timestamp/date_format speak Java patterns, so configs written
with Python directives are translated once at plan build.
"""

from __future__ import annotations

_DIRECTIVES = {
    "Y": "yyyy", "y": "yy",
    "m": "MM", "d": "dd",
    "H": "HH", "I": "hh",
    "M": "mm", "S": "ss",
    "f": "SSSSSS",
    "z": "XX", "Z": "zz",
    "a": "EEE", "A": "EEEE",
    "b": "MMM", "B": "MMMM",
    "j": "DDD", "p": "a",
    "%": "%",
}

_JAVA_RESERVED = set("GuyDMLdQqYwWEecFahKkHmsSAnNVzOXxZ'[]#{}")


def _quote_literal(text: str) -> str:
    if not text:
        return ""
    if not any(ch in _JAVA_RESERVED or ch.isalpha() for ch in text):
        return text
    return "'" + text.replace("'", "''") + "'"


def strftime_to_java(fmt: str) -> str:
    out: list[str] = []
    literal: list[str] = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            d = fmt[i + 1]
            if d in _DIRECTIVES:
                out.append(_quote_literal("".join(literal)))
                literal = []
                out.append(_DIRECTIVES[d])
                i += 2
                continue
        literal.append(ch)
        i += 1
    out.append(_quote_literal("".join(literal)))
    return "".join(out)
