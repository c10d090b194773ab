"""Scalar wave 3: network-address (IPv4/CIDR) function family.

``scalar_ip_ops`` — the log-analytics address toolkit: octet
decomposition, dotted-quad rendering, subnet extraction, RFC-1918
private-range classification, and literal-CIDR containment. Neither
engine ships INET types in this environment, and the portable
representation is the plain ``u32`` integer — every operation below
is exact integer arithmetic (divide/modulo by powers of two — the
scalar_bitwise lesson: DuckDB 1.0 has no shift operators, so shifts
are written as multiplies/divides, which Spark compiles identically),
making the whole family bitwise cross-engine and shuffle-free.

A /N CIDR test on u32 is one integer divide: ip ∈ block ⇔
ip DIV 2^(32−N) == prefix DIV 2^(32−N) — constant-folded per literal
block. The fixture has no address column, so addresses are
key-derived (Knuth multiplicative hash of user_id, the geo-coordinate
precedent), giving full octet coverage deterministically.

Totality (ADVICE r7): the naive ``(user_id * 2654435761) % 2^32``
overflows int64 once user_id exceeds ~3.47e9 — Spark (non-ANSI)
wraps silently while DuckDB raises, a silent cross-engine divergence
— and truncated ``%`` goes negative for negative ids. The derivation
is therefore (1) reduced to a POSITIVE residue first
(((id % 2^32) + 2^32) % 2^32 — both engines' % are truncated, so the
double-mod is the portable pmod), then (2) multiplied via a 16-bit
split: with a = ah·2^16 + al,
  (a·K) mod 2^32 = (((ah·K) mod 2^16)·2^16 + al·K) mod 2^32,
and every intermediate is < 1.8e14 ≪ 2^63. For NON-NEGATIVE ids below
2^32·K (every id the naive form handled without wrap or sign issues —
the fixture range) the result is bit-equal to the naive form; for
negative ids the derivations deliberately differ (the naive truncated
% yields negative residues and negative octets — the defect), and the
new form is total — exact for EVERY BIGINT user_id on both engines.

Scale: pure row-map inside WholeStageCodegen over the distinct-user
frame; the only exchange is the distinct itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# portable pmod + 16-bit-split modular multiply — total for every
# BIGINT id, bit-equal to (id * K) % 2^32 where that form is defined
_IP_DERIVE_SQL = """
        SELECT user_id,
               ((((a // 65536) * 2654435761) % 65536) * 65536
                + (a % 65536) * 2654435761) % 4294967296 AS ip_u32
        FROM (SELECT user_id,
                     ((user_id % 4294967296) + 4294967296) % 4294967296 AS a
              FROM u)
"""

_IP_ORACLE = f"""
    WITH u AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id FROM events),
    ip AS ({_IP_DERIVE_SQL}),
    o AS (
        SELECT user_id, ip_u32,
               ip_u32 // 16777216 AS o1,
               (ip_u32 // 65536) % 256 AS o2,
               (ip_u32 // 256) % 256 AS o3,
               ip_u32 % 256 AS o4
        FROM ip
    )
    SELECT user_id,
           CAST(ip_u32 AS BIGINT) AS ip_u32,
           CAST(o1 AS BIGINT) AS o1, CAST(o2 AS BIGINT) AS o2,
           CAST(o3 AS BIGINT) AS o3, CAST(o4 AS BIGINT) AS o4,
           o1 || '.' || o2 || '.' || o3 || '.' || o4 AS dotted,
           CAST(ip_u32 // 65536 AS BIGINT) AS subnet16,
           (o1 = 10) OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
               OR (o1 = 192 AND o2 = 168) AS is_private,
           ip_u32 // 4194304 = 401 AS in_cgnat,
           CASE WHEN o1 < 128 THEN 'A' WHEN o1 < 192 THEN 'B'
                WHEN o1 < 224 THEN 'C' WHEN o1 < 240 THEN 'D'
                ELSE 'E' END AS ip_class
    FROM o ORDER BY user_id
"""


@query("scalar_ip_ops", oracle=_IP_ORACLE, tags=("scalar", "network"))
def scalar_ip_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 toolkit on u32 integers: octets, dotted quad, /16 subnet,
    RFC-1918 classification, and 100.64.0.0/10 (CGNAT) containment —
    all exact divide/modulo arithmetic, no INET type needed. The u32
    derivation is TOTAL (positive-residue reduction + 16-bit-split
    modular multiply — see module docstring): no int64 overflow or
    negative octets for any BIGINT user_id, on either engine."""
    ev = load_tables(spark, sf_dir)["events"]
    u = ev.select(F.col("user_id").cast("long").alias("user_id")).distinct()
    ip = u.withColumn(
        "a", F.expr("((user_id % 4294967296) + 4294967296) % 4294967296")
    ).withColumn(
        "ip_u32",
        F.expr(
            "(((a DIV 65536) * 2654435761) % 65536) * 65536"
            " + (a % 65536) * 2654435761"
        )
        % 4294967296,
    ).drop("a")
    o = (
        ip.withColumn("o1", F.expr("ip_u32 DIV 16777216"))
        .withColumn("o2", F.expr("(ip_u32 DIV 65536) % 256"))
        .withColumn("o3", F.expr("(ip_u32 DIV 256) % 256"))
        .withColumn("o4", F.col("ip_u32") % 256)
    )
    return (
        o.select(
            "user_id",
            F.col("ip_u32").cast("long").alias("ip_u32"),
            F.col("o1").cast("long").alias("o1"),
            F.col("o2").cast("long").alias("o2"),
            F.col("o3").cast("long").alias("o3"),
            F.col("o4").cast("long").alias("o4"),
            F.concat_ws(".", "o1", "o2", "o3", "o4").alias("dotted"),
            F.expr("CAST(ip_u32 DIV 65536 AS BIGINT)").alias("subnet16"),
            (
                (F.col("o1") == 10)
                | ((F.col("o1") == 172) & F.col("o2").between(16, 31))
                | ((F.col("o1") == 192) & (F.col("o2") == 168))
            ).alias("is_private"),
            (F.expr("ip_u32 DIV 4194304") == 401).alias("in_cgnat"),
            F.when(F.col("o1") < 128, "A")
            .when(F.col("o1") < 192, "B")
            .when(F.col("o1") < 224, "C")
            .when(F.col("o1") < 240, "D")
            .otherwise("E")
            .alias("ip_class"),
        )
        .orderBy("user_id")
    )
