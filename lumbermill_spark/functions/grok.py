"""Grok-style pattern macros: ``%{NAME}`` / ``%{NAME:field}`` expansion.

Mirrors the reference's logstash-pattern support
(/root/reference/lumbermill/parser/Regex.py:113-145): pattern files are
``NAME <regex>`` lines; ``%{NAME:field}`` expands recursively to
``(?P<field>...)``; bare ``%{NAME}`` expands without a capture group.

Expansion happens ONCE at plan-build time on the driver — the executors
only ever see the fully expanded regex (as a Spark expression or inside
an Arrow UDF closure). That is the Spark-idiomatic placement: constant
folding before the plan, not per row.

The built-in pattern set below is hand-written from the well-known
grok/logstash pattern vocabulary (public knowledge); extra pattern files
in the same ``NAME regex`` format can be loaded with ``load_pattern_file``.
"""

from __future__ import annotations

import re

# Core vocabulary. Kept deliberately small and composable; each entry is
# hand-derived from the public grok pattern language.
BUILTIN_PATTERNS: dict[str, str] = {
    "INT": r"[+-]?\d+",
    "POSINT": r"\b[1-9]\d*\b",
    "NONNEGINT": r"\b\d+\b",
    "NUMBER": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "BASE16NUM": r"[+-]?(?:0x)?[0-9A-Fa-f]+",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"(?:\"(?:\\.|[^\"\\])*\"|'(?:\\.|[^'\\])*')",
    "UUID": r"[0-9A-Fa-f]{8}-(?:[0-9A-Fa-f]{4}-){3}[0-9A-Fa-f]{12}",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}(?:%\w+)?",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "HOST": r"%{HOSTNAME}",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILADDRESS": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+@%{HOSTNAME}",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "WINPATH": r"(?:[A-Za-z]:|\\)(?:\\[^\\?*]*)+",
    "URIPROTO": r"[A-Za-z]+(?:\+[A-Za-z+]+)?",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12]\d)|(?:3[01])|[1-9])",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?\d)",
    "MINUTE": r"(?:[0-5]\d)",
    "SECOND": r"(?:(?:[0-5]?\d|60)(?:[:.,]\d+)?)",
    "TIME": r"(?!<\d)%{HOUR}:%{MINUTE}(?::%{SECOND})(?!\d)",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG}(?:\[%{POSINT}\])?",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGFACILITY": r"<%{NONNEGINT}.%{NONNEGINT}>",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|INFO(?:RMATION)?|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    # composite line patterns
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{USER:ident} %{USER:auth} "
        r"\[%{HTTPDATE:timestamp}\] \"(?:%{WORD:verb} %{NOTSPACE:request}"
        r"(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" "
        r"%{NONNEGINT:response} (?:%{NONNEGINT:bytes}|-)"
    ),
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} \"%{DATA:referrer}\" \"%{DATA:agent}\"",
}

_MACRO_RE = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def load_pattern_file(path: str, into: dict[str, str] | None = None) -> dict[str, str]:
    """Read ``NAME regex`` lines (grok pattern-file format,
    parser/Regex.py:113-126 semantics: blank/#-comment lines skipped)."""
    patterns = dict(BUILTIN_PATTERNS) if into is None else into
    with open(path) as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ", 1)
            if len(parts) == 2:
                patterns[parts[0]] = parts[1]
    return patterns


def expand_grok(pattern: str, patterns: dict[str, str] | None = None,
                named_group_style: str = "python") -> str:
    """Recursively expand ``%{NAME}`` / ``%{NAME:field}`` macros.

    named_group_style: 'python' -> ``(?P<field>...)`` (for re / pandas
    UDFs); 'plain' -> ``(...)`` anonymous groups (for Spark/Java regexp
    functions, which extract by index and whose group-name grammar
    rejects underscores). Unknown pattern names are left verbatim
    (reference warns and skips, parser/Regex.py:142-144).
    """
    table = BUILTIN_PATTERNS if patterns is None else patterns

    def repl(m: re.Match) -> str:
        name, field = m.group(1), m.group(2)
        if name not in table:
            return m.group(0)
        inner = expand_grok(table[name], table, named_group_style)
        if not field:
            return "(?:%s)" % inner
        if named_group_style == "python":
            return "(?P<%s>%s)" % (field, inner)
        return "(%s)" % inner

    prev = None
    while prev != pattern:
        prev = pattern
        pattern = _MACRO_RE.sub(repl, pattern)
    return pattern
