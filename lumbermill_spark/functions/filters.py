"""LumberMill filter strings -> Spark SQL expressions.

The reference compiles module ``filter:`` strings — arbitrary Python
expressions over ``$(field)`` refs — to lambdas via string rewrite + eval
(/root/reference/lumbermill/utils/DynamicValues.py:66-77,
BaseModule.py:151-182). Evaluating arbitrary Python per event is both
unsafe and per-row; here the grammar is restricted to what translates to
a Spark SQL expression, compiled ONCE by Catalyst:

- ``$(field.path)`` -> backquoted column reference
- ``==``/``!=``/``<``/``>``/``and``/``or``/``not``/``in`` pass through
  (valid Spark SQL)
- ``re.match('pat', $(f))`` / ``re.search('pat', $(f))`` ->
  ``$(f) rlike 'pat'`` (match anchors at start)
- a leading ``if `` is stripped (reference filter strings start with it)

Anything outside that raises at plan build — fail fast, not mid-job.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_REF = re.compile(r"\$\(([\w.\-]+)\)")
_RE_MATCH = re.compile(
    r"re\.(match|search)\(\s*(?P<q>['\"])(?P<pat>.*?)(?P=q)\s*,\s*(?P<arg>[^)]+)\)"
)
_FORBIDDEN = re.compile(r"__|;|\bimport\b|\bexec\b|\beval\b|\blambda\b|\bopen\b")


def filter_to_sql(filter_string: str) -> str:
    s = filter_string.strip()
    if s.startswith("if "):
        s = s[3:]
    if _FORBIDDEN.search(s):
        raise ValueError(f"filter string not in the supported grammar: {s!r}")

    def re_repl(m: re.Match) -> str:
        pat = m.group("pat")
        if m.group(1) == "match" and not pat.startswith("^"):
            pat = "^" + pat
        return f"({m.group('arg').strip()} rlike '{pat}')"

    # refs first: $(f) has parens. Dotted paths quote per segment so
    # struct access works: $(geo.country) -> `geo`.`country` (a single
    # backquoted `geo.country` would name a literal dotted column).
    s = _REF.sub(
        lambda m: ".".join(f"`{p}`" for p in m.group(1).split(".")), s
    )
    s = _RE_MATCH.sub(re_repl, s)
    return s


def filter_to_column(filter_string: str) -> Column:
    return F.expr(filter_to_sql(filter_string))
