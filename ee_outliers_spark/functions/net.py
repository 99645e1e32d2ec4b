"""IP/CIDR utilities (ref X15; /root/reference/app/helpers/utils.py:79-87
wraps netaddr.all_matching_cidrs — unused by the reference's analyzers but
part of its utility surface).

Pure column arithmetic: the CIDR list is parsed driver-side with the stdlib
``ipaddress`` module and compiled into (network, mask) literal comparisons —
JVM-codegen per row, no UDF, no external dependency.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column
from pyspark.sql import functions as F


def ipv4_to_long(col) -> Column:
    """Dotted-quad string → uint32-as-long; malformed input → NULL."""
    c = col if isinstance(col, Column) else F.col(col)
    valid = c.rlike(
        r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
        r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
    )
    parts = F.split(c, r"\.")
    val = (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )
    return F.when(valid, val)


def ip_in_cidrs(col, cidrs: list[str]) -> Column:
    """True iff the IPv4 column matches ANY of the CIDR blocks."""
    ip = ipv4_to_long(col)
    pred = F.lit(False)
    for cidr in cidrs:
        net = ipaddress.ip_network(cidr, strict=False)
        mask = int(net.netmask)
        base = int(net.network_address)
        pred = pred | (ip.bitwiseAND(F.lit(mask)) == F.lit(base))
    return F.coalesce(pred, F.lit(False))


def matching_cidrs_py(ip: str, cidrs: list[str]) -> list[str]:
    """Python twin (the reference's all_matching_cidrs shape)."""
    try:
        addr = ipaddress.ip_address(ip)
    except ValueError:
        return []
    out = []
    for c in cidrs:
        if addr in ipaddress.ip_network(c, strict=False):
            out.append(c)
    return out
