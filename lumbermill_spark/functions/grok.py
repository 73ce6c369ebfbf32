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
    # numeric / hardware extras
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "FLOAT": r"[+-]?(?:\d+\.\d+|\.\d+)(?:[eE][+-]?\d+)?",
    "BASE16FLOAT": r"\b[+-]?(?:0x)?(?:[0-9A-Fa-f]+(?:\.[0-9A-Fa-f]*)?"
                   r"|\.[0-9A-Fa-f]+)\b",
    "CISCOMAC": r"(?:[0-9A-Fa-f]{4}\.){2}[0-9A-Fa-f]{4}",
    "WINDOWSMAC": r"(?:[0-9A-Fa-f]{2}-){5}[0-9A-Fa-f]{2}",
    "COMMONMAC": r"(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}",
    "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    "TTY": r"/dev/(?:pts|tty(?:[pq])?)(?:\w+)?(?:/\w+)?",
    # date/time extras
    "ISO8601_SECOND": r"(?:%{SECOND}|60)",
    "DATE": r"(?:%{DATE_US}|%{DATE_EU})",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "TZ": r"(?:[PMCE][SD]T|UTC|GMT|Z)",
    "DATESTAMP_RFC822": r"%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "DATESTAMP_OTHER": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "QS": r"%{QUOTEDSTRING}",
    "HTTPMETHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT)",
    "HTTPVERSION": r"HTTP/%{NUMBER}",
    # composite line patterns
    "SYSLOGBASE": (
        r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?"
        r"%{SYSLOGHOST:logsource} %{PROG:program}(?:\[%{POSINT:pid}\])?:"
    ),
    "SYSLOGLINE": r"%{SYSLOGBASE} %{GREEDYDATA:message}",
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{USER:ident} %{USER:auth} "
        r"\[%{HTTPDATE:timestamp}\] \"(?:%{WORD:verb} %{NOTSPACE:request}"
        r"(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" "
        r"%{NONNEGINT:response} (?:%{NONNEGINT:bytes}|-)"
    ),
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} \"%{DATA:referrer}\" \"%{DATA:agent}\"",
    # httpd error logs. NOTE: the classic combined HTTPD_ERRORLOG
    # (2.0-or-2.4 alternation) repeats field names across branches,
    # which Python's re rejects — in this engine the alternation is a
    # two-rule first-match RegexParser config instead.
    "HTTPDERROR_DATE": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}",
    "HTTPD20_ERRORLOG": (
        r"\[%{HTTPDERROR_DATE:timestamp}\] \[%{LOGLEVEL:loglevel}\] "
        r"(?:\[client %{IPORHOST:clientip}\] )?%{GREEDYDATA:message}"
    ),
    "HTTPD24_ERRORLOG": (
        r"\[%{HTTPDERROR_DATE:timestamp}\] "
        r"\[%{WORD:module}:%{LOGLEVEL:loglevel}\] "
        r"\[pid %{POSINT:pid}(?::tid %{NONNEGINT:tid})?\]"
        r"(?: \[client %{IPORHOST:clientip}:%{POSINT:clientport}\])? "
        r"%{GREEDYDATA:message}"
    ),
}

# HAProxy log vocabulary (public logstash pattern language; reference
# ships it as assets/grok_patterns/haproxy).
HAPROXY_PATTERNS: dict[str, str] = {
    "HAPROXYTIME": r"%{HOUR}:%{MINUTE}(?::%{SECOND})",
    "HAPROXYDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{HAPROXYTIME}\.%{INT}",
    "HAPROXYCAPTUREDREQUESTHEADERS": r"%{DATA:captured_request_headers}",
    "HAPROXYCAPTUREDRESPONSEHEADERS": r"%{DATA:captured_response_headers}",
    "HAPROXYHTTP": (
        r"(?:%{SYSLOGTIMESTAMP:syslog_timestamp}"
        r"|%{TIMESTAMP_ISO8601:timestamp8601}) "
        r"%{IPORHOST:syslog_server} %{SYSLOGPROG}: "
        r"%{IP:client_ip}:%{INT:client_port} \[%{HAPROXYDATE:accept_date}\] "
        r"%{NOTSPACE:frontend_name} "
        r"%{NOTSPACE:backend_name}/%{NOTSPACE:server_name} "
        r"%{INT:time_request}/%{INT:time_queue}/%{INT:time_backend_connect}"
        r"/%{INT:time_backend_response}/%{NOTSPACE:time_duration} "
        r"%{INT:http_status_code} %{NOTSPACE:bytes_read} "
        r"%{DATA:captured_request_cookie} %{DATA:captured_response_cookie} "
        r"%{NOTSPACE:termination_state} "
        r"%{INT:actconn}/%{INT:feconn}/%{INT:beconn}/%{INT:srvconn}"
        r"/%{NOTSPACE:retries} %{INT:srv_queue}/%{INT:backend_queue}"
        r"(?: \{%{HAPROXYCAPTUREDREQUESTHEADERS}\})?"
        r"(?: \{%{HAPROXYCAPTUREDRESPONSEHEADERS}\})? "
        r"\"(?:<BADREQ>|(?:%{WORD:http_verb} "
        r"(?:%{URIPROTO:http_proto}://)?"
        r"(?:(?:%{USER:http_user}(?::[^@]*)?@)?(?:%{URIHOST:http_host})?)?"
        r"(?:%{URIPATHPARAM:http_request})?"
        r"(?: HTTP/%{NUMBER:http_version})?))?\""
    ),
    "HAPROXYTCP": (
        r"(?:%{SYSLOGTIMESTAMP:syslog_timestamp}"
        r"|%{TIMESTAMP_ISO8601:timestamp8601}) "
        r"%{IPORHOST:syslog_server} %{SYSLOGPROG}: "
        r"%{IP:client_ip}:%{INT:client_port} \[%{HAPROXYDATE:accept_date}\] "
        r"%{NOTSPACE:frontend_name} "
        r"%{NOTSPACE:backend_name}/%{NOTSPACE:server_name} "
        r"%{INT:time_queue}/%{INT:time_backend_connect}"
        r"/%{NOTSPACE:time_duration} %{NOTSPACE:bytes_read} "
        r"%{NOTSPACE:termination_state} "
        r"%{INT:actconn}/%{INT:feconn}/%{INT:beconn}/%{INT:srvconn}"
        r"/%{NOTSPACE:retries} %{INT:srv_queue}/%{INT:backend_queue}"
    ),
}

# Firewall vocabulary: NetScreen session logs + Cisco ASA tagged syslog
# and per-message-ID bodies (public logstash pattern language; reference
# ships it as assets/grok_patterns/firewalls).
FIREWALL_PATTERNS: dict[str, str] = {
    "NETSCREENSESSIONLOG": (
        r"%{SYSLOGTIMESTAMP:date} %{IPORHOST:device} %{IPORHOST}: "
        r"NetScreen device_id=%{WORD:device_id}%{DATA}: "
        r"start_time=%{QUOTEDSTRING:start_time} duration=%{INT:duration} "
        r"policy_id=%{INT:policy_id} service=%{DATA:service} "
        r"proto=%{INT:proto} src zone=%{WORD:src_zone} "
        r"dst zone=%{WORD:dst_zone} action=%{WORD:action} "
        r"sent=%{INT:sent} rcvd=%{INT:rcvd} "
        r"src=%{IPORHOST:src_ip} dst=%{IPORHOST:dst_ip} "
        r"src_port=%{INT:src_port} dst_port=%{INT:dst_port}"
    ),
    "CISCOTIMESTAMP": r"%{MONTH} +%{MONTHDAY}(?: %{YEAR})? %{TIME}",
    "CISCOTAG": r"[A-Z0-9]+-%{INT}-(?:[A-Z0-9_]+)",
    "CISCO_TAGGED_SYSLOG": (
        r"^<%{POSINT:syslog_pri}>%{CISCOTIMESTAMP:timestamp}"
        r"(?: %{SYSLOGHOST:sysloghost})? ?: %%{CISCOTAG:ciscotag}:"
    ),
    "CISCO_ACTION": (
        r"(?:Built|Teardown|Deny|Denied|denied by ACL|denied|requested"
        r"|permitted|discarded|est-allowed|Dropping|created|deleted)"
    ),
    "CISCO_REASON": (
        r"(?:Duplicate TCP SYN|Failed to locate egress interface"
        r"|Invalid transport field|No matching connection|DNS Response"
        r"|DNS Query|(?:%{WORD}\s*)*)"
    ),
    "CISCO_DIRECTION": r"(?:Inbound|inbound|Outbound|outbound)",
    "CISCO_INTERVAL": r"(?:first hit|%{INT}-second interval)",
    "CISCO_XLATE_TYPE": r"(?:static|dynamic)",
    "CISCOFW106001": (
        r"%{CISCO_DIRECTION:direction} %{WORD:protocol} connection "
        r"%{CISCO_ACTION:action} from %{IP:src_ip}/%{INT:src_port} to "
        r"%{IP:dst_ip}/%{INT:dst_port} flags %{GREEDYDATA:tcp_flags} "
        r"on interface %{GREEDYDATA:interface}"
    ),
    "CISCOFW106006_106007_106010": (
        r"%{CISCO_ACTION:action} %{CISCO_DIRECTION:direction} "
        r"%{WORD:protocol} (?:from|src) %{IP:src_ip}/%{INT:src_port}"
        r"(?:\(%{DATA:src_fwuser}\))? (?:to|dst) "
        r"%{IP:dst_ip}/%{INT:dst_port}(?:\(%{DATA:dst_fwuser}\))? "
        r"(?:on interface %{DATA:interface}|due to %{CISCO_REASON:reason})"
    ),
    "CISCOFW106014": (
        r"%{CISCO_ACTION:action} %{CISCO_DIRECTION:direction} "
        r"%{WORD:protocol} src %{DATA:src_interface}:%{IP:src_ip}"
        r"(?:\(%{DATA:src_fwuser}\))? dst %{DATA:dst_interface}:"
        r"%{IP:dst_ip}(?:\(%{DATA:dst_fwuser}\))? "
        r"\(type %{INT:icmp_type}, code %{INT:icmp_code}\)"
    ),
    "CISCOFW106015": (
        r"%{CISCO_ACTION:action} %{WORD:protocol} \(%{DATA:policy_id}\) "
        r"from %{IP:src_ip}/%{INT:src_port} to %{IP:dst_ip}/%{INT:dst_port} "
        r"flags %{DATA:tcp_flags} on interface %{GREEDYDATA:interface}"
    ),
    "CISCOFW106021": (
        r"%{CISCO_ACTION:action} %{WORD:protocol} reverse path check from "
        r"%{IP:src_ip} to %{IP:dst_ip} on interface %{GREEDYDATA:interface}"
    ),
    "CISCOFW106023": (
        r"%{CISCO_ACTION:action}(?: protocol)? %{WORD:protocol} "
        r"src %{DATA:src_interface}:%{DATA:src_address}(?:/%{INT:src_port})?"
        r"(?:\(%{DATA:src_fwuser}\))? "
        r"dst %{DATA:dst_interface}:%{DATA:dst_address}(?:/%{INT:dst_port})?"
        r"(?:\(%{DATA:dst_fwuser}\))?"
        r"(?: \(type %{INT:icmp_type}, code %{INT:icmp_code}\))? "
        r"by access-group \"?%{DATA:policy_id}\"? "
        r"\[%{DATA:hashcode1}, %{DATA:hashcode2}\]"
    ),
    "CISCOFW106100": (
        r"access-list %{NOTSPACE:policy_id} %{CISCO_ACTION:action} "
        r"%{WORD:protocol} %{DATA:src_interface}/%{IP:src_ip}"
        r"\(%{INT:src_port}\)(?:\(%{DATA:src_fwuser}\))? -> "
        r"%{DATA:dst_interface}/%{IP:dst_ip}\(%{INT:dst_port}\)"
        r"(?:\(%{DATA:dst_fwuser}\))? hit-cnt %{INT:hit_count} "
        r"%{CISCO_INTERVAL:interval} \[%{DATA:hashcode1}, %{DATA:hashcode2}\]"
    ),
    "CISCOFW110002": (
        r"%{CISCO_REASON:reason} for %{WORD:protocol} from "
        r"%{DATA:src_interface}:%{IP:src_ip}/%{INT:src_port} to "
        r"%{IP:dst_ip}/%{INT:dst_port}"
    ),
    "CISCOFW302010": (
        r"%{INT:connection_count} in use, "
        r"%{INT:connection_count_max} most used"
    ),
    "CISCOFW302013_302014_302015_302016": (
        r"%{CISCO_ACTION:action}(?: %{CISCO_DIRECTION:direction})? "
        r"%{WORD:protocol} connection %{INT:connection_id} for "
        r"%{DATA:src_interface}:%{IP:src_ip}/%{INT:src_port}"
        r"(?: \(%{IP:src_mapped_ip}/%{INT:src_mapped_port}\))?"
        r"(?:\(%{DATA:src_fwuser}\))? to "
        r"%{DATA:dst_interface}:%{IP:dst_ip}/%{INT:dst_port}"
        r"(?: \(%{IP:dst_mapped_ip}/%{INT:dst_mapped_port}\))?"
        r"(?:\(%{DATA:dst_fwuser}\))?"
        r"(?: duration %{TIME:duration} bytes %{INT:bytes})?"
        r"(?: %{CISCO_REASON:reason})?(?: \(%{DATA:user}\))?"
    ),
    "CISCOFW302020_302021": (
        r"%{CISCO_ACTION:action}(?: %{CISCO_DIRECTION:direction})? "
        r"%{WORD:protocol} connection for faddr %{IP:dst_ip}/"
        r"%{INT:icmp_seq_num}(?:\(%{DATA:fwuser}\))? gaddr "
        r"%{IP:src_xlated_ip}/%{INT:icmp_code_xlated} laddr "
        r"%{IP:src_ip}/%{INT:icmp_code}(?: \(%{DATA:user}\))?"
    ),
    "CISCOFW305011": (
        r"%{CISCO_ACTION:action} %{CISCO_XLATE_TYPE:xlate_type} "
        r"%{WORD:protocol} translation from %{DATA:src_interface}:"
        r"%{IP:src_ip}(?:/%{INT:src_port})?(?:\(%{DATA:src_fwuser}\))? to "
        r"%{DATA:src_xlated_interface}:%{IP:src_xlated_ip}/"
        r"%{DATA:src_xlated_port}"
    ),
    "CISCOFW313001_313004_313008": (
        r"%{CISCO_ACTION:action} %{WORD:protocol} type=%{INT:icmp_type}, "
        r"code=%{INT:icmp_code} from %{IP:src_ip} on interface "
        r"%{DATA:interface}(?: to %{IP:dst_ip})?"
    ),
    "CISCOFW313005": (
        r"%{CISCO_REASON:reason} for %{WORD:protocol} error message: "
        r"%{WORD:err_protocol} src %{DATA:err_src_interface}:"
        r"%{IP:err_src_ip}(?:\(%{DATA:err_src_fwuser}\))? dst "
        r"%{DATA:err_dst_interface}:%{IP:err_dst_ip}"
        r"(?:\(%{DATA:err_dst_fwuser}\))? \(type %{INT:err_icmp_type}, "
        r"code %{INT:err_icmp_code}\) on %{DATA:interface} interface\."
        r" +Original IP payload: %{WORD:protocol2} src "
        r"%{IP:orig_src_ip}/%{INT:orig_src_port}"
        r"(?:\(%{DATA:orig_src_fwuser}\))? dst "
        r"%{IP:orig_dst_ip}/%{INT:orig_dst_port}"
        r"(?:\(%{DATA:orig_dst_fwuser}\))?"
    ),
    "CISCOFW402117": (
        r"%{WORD:protocol}: Received a non-IPSec packet "
        r"\(protocol= %{WORD:orig_protocol}\) from %{IP:src_ip} to "
        r"%{IP:dst_ip}"
    ),
    "CISCOFW402119": (
        r"%{WORD:protocol}: Received an %{WORD:orig_protocol} packet "
        r"\(SPI= %{DATA:spi}, sequence number= %{DATA:seq_num}\) from "
        r"%{IP:src_ip} \(user= %{DATA:user}\) to %{IP:dst_ip} that "
        r"failed anti-replay checking"
    ),
    "CISCOFW419001": (
        r"%{CISCO_ACTION:action} %{WORD:protocol} packet from "
        r"%{DATA:src_interface}:%{IP:src_ip}/%{INT:src_port} to "
        r"%{DATA:dst_interface}:%{IP:dst_ip}/%{INT:dst_port}, reason: "
        r"%{GREEDYDATA:reason}"
    ),
    "CISCOFW419002": (
        r"%{CISCO_REASON:reason} from %{DATA:src_interface}:"
        r"%{IP:src_ip}/%{INT:src_port} to %{DATA:dst_interface}:"
        r"%{IP:dst_ip}/%{INT:dst_port} with different initial sequence "
        r"number"
    ),
    "CISCOFW500004": (
        r"%{CISCO_REASON:reason} for protocol=%{WORD:protocol}, from "
        r"%{IP:src_ip}/%{INT:src_port} to %{IP:dst_ip}/%{INT:dst_port}"
    ),
    "CISCOFW602303_602304": (
        r"%{WORD:protocol}: An %{CISCO_DIRECTION:direction} "
        r"%{GREEDYDATA:tunnel_type} SA \(SPI= %{DATA:spi}\) between "
        r"%{IP:src_ip} and %{IP:dst_ip} \(user= %{DATA:user}\) has been "
        r"%{CISCO_ACTION:action}"
    ),
    "CISCOFW710001_710002_710003_710005_710006": (
        r"%{WORD:protocol} (?:request|access) %{CISCO_ACTION:action} from "
        r"%{IP:src_ip}/%{INT:src_port} to %{DATA:dst_interface}:"
        r"%{IP:dst_ip}/%{INT:dst_port}"
    ),
    "CISCOFW713172": (
        r"Group = %{GREEDYDATA:group}, IP = %{IP:src_ip}, Automatic NAT "
        r"Detection Status:\s+Remote end\s*%{DATA:is_remote_natted}\s*"
        r"behind a NAT device\s+This\s+end\s*%{DATA:is_local_natted}\s*"
        r"behind a NAT device"
    ),
    "CISCOFW733100": (
        r"\[\s*%{DATA:drop_type}\s*\] drop %{DATA:drop_rate_id} exceeded\. "
        r"Current burst rate is %{INT:drop_rate_current_burst} per second, "
        r"max configured rate is %{INT:drop_rate_max_burst}; Current "
        r"average rate is %{INT:drop_rate_current_avg} per second, max "
        r"configured rate is %{INT:drop_rate_max_avg}; Cumulative total "
        r"count is %{INT:drop_total_count}"
    ),
}

# the full default vocabulary: core + haproxy + firewalls (the reference
# loads its whole grok_patterns dir the same way, parser/Regex.py:113-126)
BUILTIN_PATTERNS.update(HAPROXY_PATTERNS)
BUILTIN_PATTERNS.update(FIREWALL_PATTERNS)

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
