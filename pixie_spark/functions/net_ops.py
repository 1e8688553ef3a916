"""Network functions.

Reference: src/carnot/funcs/net/net_ops.cc (nslookup) and parts of
src/carnot/funcs/builtins (ip helpers). Live DNS from executors is an
anti-pattern at scale (and unavailable here): nslookup resolves against
a provided/broadcast hostname dimension table instead; pure-IP helpers
are native expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def nslookup(df: DataFrame, addr_col: str, dns_table: DataFrame, out_col: str = "hostname") -> DataFrame:
    """Resolve addresses via broadcast join against (ip, hostname).

    The reference does a blocking getnameinfo per row (net_ops.cc) —
    fine on a per-node agent, wrong on a 1000-executor cluster; a
    broadcast dimension join is the scale-correct equivalent.
    """
    dim = F.broadcast(dns_table.select(F.col("ip").alias(addr_col), F.col("hostname").alias(out_col)))
    return df.join(dim, addr_col, "left")


def ip_is_private(col) -> Column:
    """RFC1918 / loopback / link-local check, native expressions."""
    c = _c(col)
    return (
        c.startswith("10.")
        | c.startswith("192.168.")
        | c.rlike(r"^172\.(1[6-9]|2[0-9]|3[01])\.")
        | c.startswith("127.")
        | c.startswith("169.254.")
    )


def ip_to_int(col) -> Column:
    """IPv4 dotted-quad → int64 (for range joins against CIDR tables)."""
    parts = F.split(_c(col), r"\.")
    return (
        parts[0].cast("long") * 16777216
        + parts[1].cast("long") * 65536
        + parts[2].cast("long") * 256
        + parts[3].cast("long")
    )
