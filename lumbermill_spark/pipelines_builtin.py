"""Built-in rule sets and the flagship pipeline spec.

These model the reference's README example pipeline
(/root/reference/README.rst:181-245): regex-parse access-log/syslog
lines, tag event_type by matching rule, route per event_type to sinks,
mark unparseable lines 'Unknown'.

The rules are written against the synthetic corpus templates in
lumbermill_spark/data/synth.py (FIXTURES.md F1/F2) — nginx combined-log
first (it is a superset of the common log format, so rule order matters
exactly as it does in the reference's ordered rule list).
"""

from __future__ import annotations

# Ordered: combined (nginx) before common (apache) — first match wins.
ACCESS_RULES: list[dict] = [
    {
        "nginx_access_log": (
            r'(?P<remote_ip>\d+\.\d+\.\d+\.\d+)\s+-\s+(?P<user>\S+)\s+'
            r'\[(?P<datetime>[^\]]+)\]\s+"(?P<method>\w+) (?P<url>\S+) HTTP/1\.1"\s+'
            r'(?P<http_status>\d+)\s+(?P<bytes_send>\d+)\s+'
            r'"(?P<referer>[^"]*)"\s+"(?P<user_agent>[^"]*)"'
        )
    },
    {
        "httpd_access_log": (
            r'(?P<remote_ip>\d+\.\d+\.\d+\.\d+)\s+-\s+(?P<user>\S+)\s+'
            r'\[(?P<datetime>[^\]]+)\]\s+"(?P<method>\w+) (?P<url>\S+) HTTP/1\.0"\s+'
            r'(?P<http_status>\d+)\s+(?P<bytes_send>\d+)'
        )
    },
    {
        "iptables_log": (
            r'<(?P<syslog_prival>\d+)>(?P<log_timestamp>\w+ +\d+ \d+:\d+:\d+) '
            r'(?P<host>\S+) kernel: iptables (?P<iptables_action>\w+): '
            r'IN=(?P<iptables_in>\S*) OUT=(?P<iptables_out>\S*) '
            r'SRC=(?P<iptables_src>\S+) DST=(?P<iptables_dst>\S+) '
            r'PROTO=(?P<iptables_proto>\S+) SPT=(?P<iptables_spt>\d+) '
            r'DPT=(?P<iptables_dpt>\d+)'
        )
    },
]

# status-code class lookup used by the enrich stage (modifier.Field 'map'
# action analog, /root/reference/lumbermill/modifier/Field.py:562-580)
HTTP_STATUS_MAP: dict[str, str] = {
    "100": "informational",
    "200": "success",
    "301": "redirect",
    "304": "redirect",
    "400": "client_error",
    "404": "client_error",
    "500": "server_error",
}
