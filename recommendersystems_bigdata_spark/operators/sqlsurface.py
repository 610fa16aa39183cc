"""SQL-syntax surface completeness (SURVEY.md §2.AK, round 9).

Every other suite declares its plan through the DataFrame API; this one
is the PURE-SQL entry surface a reference user migrating their query
files would hit first — each query registers the corpus views and runs
ONE ``spark.sql`` string exercising a construct the rest of the repo
doesn't: null-safe join keys (``<=>``), ``LATERAL VIEW posexplode``,
inline ``VALUES`` dimensions, ``add_months`` end-of-month clamping,
``try_divide`` NULL-on-error arithmetic, and ``GROUP BY ALL`` /
``ORDER BY ALL`` resolution. The DuckDB oracles spell the same
semantics in that engine's dialect (``IS NOT DISTINCT FROM``, zipped
``unnest`` + ``generate_subscripts``, ``VALUES`` CTEs, ``+ INTERVAL``,
guarded ``CASE``), so each hash match certifies the CONSTRUCT's
semantics — not shared syntax.

Spark-first shape, sized for 100 TB: the SQL strings lower to exactly
the plans the DataFrame suites pin — null-safe equality is an equi-join
key (broadcast here, never a nested loop), the lateral fan-out is a
Generate over a pruned single-column scan, the VALUES dim is a
broadcast LocalRelation, and every census is one partial-aggregated
groupBy. Plan tests assert all four.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from recommendersystems_bigdata_spark.catalog import register_views
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"


@query(
    "q_nullsafe_dim_match",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment, nullif(c_nationkey, 13) AS nk FROM customer
    ),
    d AS (
      SELECT nullif(n_nationkey, 13) AS nk, n_name FROM nation
    )
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN c.nk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unknown_matched,
           CAST(sum(CASE WHEN c.nk IS NOT NULL AND d.n_name IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_known_matched
    FROM c JOIN d ON c.nk IS NOT DISTINCT FROM d.nk
    GROUP BY 1 ORDER BY c.c_mktsegment
    """,
)
def q_nullsafe_dim_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AK ak1 — null-safe dimension lookup: customers whose nation
    code is 'unknown' (engineered NULL via ``nullif(nk, 13)``) must
    match the dimension's own unknown row — the ``<=>`` join key
    semantics every SCD pipeline needs, where ``=`` silently drops the
    NULL bucket. Census per segment: total matched, unknown-matched,
    known-matched (inner join, so the counts certify nothing fell out).

    Scale: ``<=>`` is an EQUI-join key to Catalyst (EqualNullSafe) —
    the 25-row dim broadcasts and the fact is never shuffled; NULL
    fan-out is bounded by the single unknown dim row."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH c AS (
          SELECT c_mktsegment, nullif(c_nationkey, 13) AS nk FROM customer
        ),
        d AS (
          SELECT nullif(n_nationkey, 13) AS nk, n_name FROM nation
        )
        SELECT /*+ BROADCAST(d) */ c.c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(CASE WHEN c.nk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_unknown_matched,
               CAST(sum(CASE WHEN c.nk IS NOT NULL AND d.n_name IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_known_matched
        FROM c JOIN d ON c.nk <=> d.nk
        GROUP BY 1 ORDER BY c.c_mktsegment
        """
    )


@query(
    "q_lateral_token_positions",
    oracle="""
    WITH toks AS (
      SELECT u.pos - 1 AS pos, u.tok
      FROM documents, LATERAL (
        SELECT unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos
      ) u
      WHERE u.pos <= 3
    ),
    counted AS (
      SELECT pos, tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2
    ),
    ranked AS (
      SELECT pos, tok, n,
             row_number() OVER (PARTITION BY pos ORDER BY n DESC, tok) AS rnk
      FROM counted
    )
    SELECT pos, rnk, tok, n FROM ranked WHERE rnk <= 5 ORDER BY pos, rnk
    """,
)
def q_lateral_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AK ak2 — positional token profile: ``LATERAL VIEW
    posexplode`` over the document token stream, keeping positions
    0–2, then the top-5 tokens per position — how documents OPEN
    (boilerplate headers live in the first tokens; m-suite curation
    uses exactly this signal). The oracle zips DuckDB's ``unnest`` with
    ``generate_subscripts`` — a genuinely different lateral mechanism,
    so the hash match pins the position semantics.

    Scale: Generate fan-out is capped at 3 rows per document BEFORE the
    groupBy (the WHERE lands inside the Generate's child projection);
    the rank window runs over the bounded (pos, token) census."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH toks AS (
          SELECT pos, tok
          FROM documents LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok
          WHERE pos < 3
        ),
        counted AS (
          SELECT pos, tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2
        ),
        ranked AS (
          SELECT pos, tok, n,
                 row_number() OVER (PARTITION BY pos ORDER BY n DESC, tok) AS rnk
          FROM counted
        )
        SELECT pos, rnk, tok, n FROM ranked WHERE rnk <= 5 ORDER BY pos, rnk
        """
    )


@query(
    "q_values_sla_breach",
    oracle=f"""
    WITH sla(prio, sla_days) AS (
      VALUES ('1-URGENT', 30), ('2-HIGH', 60), ('3-MEDIUM', 90),
             ('4-NOT SPECIFIED', 120), ('5-LOW', 150)
    ),
    first_ship AS (
      SELECT l_orderkey AS ok,
             min(CAST(date_diff('day', DATE '1970-01-01',
                                CAST(l_shipdate AS DATE)) AS BIGINT)) AS d1
      FROM lineitem GROUP BY 1
    )
    SELECT s.prio, CAST(s.sla_days AS BIGINT) AS sla_days,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN f.d1 - CAST(date_diff('day', DATE '1970-01-01',
                         CAST(o.o_orderdate AS DATE)) AS BIGINT) > s.sla_days
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_breaches,
           (10000 * CAST(sum(CASE WHEN f.d1 - CAST(date_diff('day',
                         DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
                         AS BIGINT) > s.sla_days THEN 1 ELSE 0 END) AS BIGINT))
             // CAST(count(*) AS BIGINT) AS breach_bp
    FROM orders o
    JOIN first_ship f ON o.o_orderkey = f.ok
    JOIN sla s ON o.o_orderpriority = s.prio
    GROUP BY 1, 2 ORDER BY s.prio
    """,
)
def q_values_sla_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AK ak3 — inline-VALUES SLA audit: a literal ``VALUES``
    dimension maps each priority to its shipping SLA; orders breach
    when the FIRST shipment lands past order date + SLA days. The
    config-as-code dim join every ops dashboard starts as, before the
    mapping graduates to a real table.

    Scale: the VALUES dim is a 5-row LocalRelation — broadcast, never
    shuffled; lineitem collapses to per-order min first (one orderkey
    exchange), then joins orders and the census is |priorities| rows."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH sla AS (
          SELECT * FROM VALUES ('1-URGENT', 30), ('2-HIGH', 60),
                               ('3-MEDIUM', 90), ('4-NOT SPECIFIED', 120),
                               ('5-LOW', 150) AS t(prio, sla_days)
        ),
        first_ship AS (
          SELECT l_orderkey AS ok,
                 min(CAST(datediff(CAST(l_shipdate AS DATE),
                                   DATE '1970-01-01') AS BIGINT)) AS d1
          FROM lineitem GROUP BY 1
        )
        SELECT /*+ BROADCAST(s) */ s.prio,
               CAST(s.sla_days AS BIGINT) AS sla_days,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN f.d1 - CAST(datediff(CAST(o.o_orderdate
                             AS DATE), DATE '1970-01-01') AS BIGINT)
                             > s.sla_days THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_breaches,
               (10000 * CAST(sum(CASE WHEN f.d1 - CAST(datediff(
                             CAST(o.o_orderdate AS DATE), DATE '1970-01-01')
                             AS BIGINT) > s.sla_days THEN 1 ELSE 0 END)
                             AS BIGINT))
                 div CAST(count(*) AS BIGINT) AS breach_bp
        FROM orders o
        JOIN first_ship f ON o.o_orderkey = f.ok
        JOIN sla s ON o.o_orderpriority = s.prio
        GROUP BY 1, 2 ORDER BY s.prio
        """
    )


@query(
    "q_eom_clamp_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(day(CAST(o_orderdate AS DATE)) AS BIGINT) AS dom,
             CAST(o_orderdate AS DATE) AS od
      FROM orders WHERE day(CAST(o_orderdate AS DATE)) >= 28
    )
    SELECT dom, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN day(od + INTERVAL 1 MONTH) < dom
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamp_1mo,
           CAST(sum(CASE WHEN day(od + INTERVAL 12 MONTH) < dom
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamp_12mo
    FROM d GROUP BY 1 ORDER BY dom
    """,
)
def q_eom_clamp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AK ak4 — end-of-month clamp audit: for orders placed on day
    28–31, does the +1-month and +12-month anniversary CLAMP to a
    shorter month end (``add_months`` semantics — the billing-cycle
    gotcha that shifts renewal revenue between months)? Spark's
    ``add_months`` and DuckDB's ``+ INTERVAL`` share the
    clamp-to-last-day convention; the hash match certifies it,
    including the Feb-29 leap case in the 12-month column.

    Scale: pushed day-of-month filter, map-side date arithmetic, one
    groupBy to ≤4 rows."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH d AS (
          SELECT CAST(day(CAST(o_orderdate AS DATE)) AS BIGINT) AS dom,
                 CAST(o_orderdate AS DATE) AS od
          FROM orders WHERE day(CAST(o_orderdate AS DATE)) >= 28
        )
        SELECT dom, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN day(add_months(od, 1)) < dom
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clamp_1mo,
               CAST(sum(CASE WHEN day(add_months(od, 12)) < dom
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clamp_12mo
        FROM d GROUP BY 1 ORDER BY dom
        """
    )


@query(
    "q_try_divide_guards",
    oracle=f"""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(sum(CASE WHEN l_returnflag = 'R'
                           THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS r_qty,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_lines
      FROM lineitem GROUP BY 1
    ),
    rated AS (
      SELECT CASE WHEN r_lines = 0 THEN NULL
                  ELSE (10000 * r_qty) // r_lines END AS rate_bp
      FROM per_part
    )
    SELECT CAST(count(*) AS BIGINT) AS n_parts,
           CAST(count(rate_bp) AS BIGINT) AS n_defined,
           CAST(count(*) - count(rate_bp) AS BIGINT) AS n_zero_denominator,
           CAST(sum(rate_bp) AS BIGINT) AS sum_rate_bp
    FROM rated
    """,
)
def q_try_divide_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AK ak5 — NULL-on-error arithmetic: per-part returned-quantity
    rate via ``try_divide``, where parts with zero returned lines make
    the denominator 0 — ``try_divide`` yields NULL instead of the ANSI
    abort, and the census counts defined vs undefined rates plus an
    exact checksum. The oracle spells the SAME semantics as a guarded
    ``CASE`` — the claim under test is exactly ``try_divide(a, b) ≡
    CASE WHEN b = 0 THEN NULL ELSE a div b END`` for integer inputs
    (the quotient is floored on both sides, both operands
    non-negative). 10000·r_qty ≤ 10¹⁰ is exact in the double
    ``try_divide`` returns, and floor recovers the integer quotient.

    Scale: one partkey partial agg, then a 1-row census — the try_
    arithmetic is map-side over the bounded per-part relation."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH per_part AS (
          SELECT l_partkey,
                 CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                      AS BIGINT) AS r_qty,
                 CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                      AS BIGINT) AS r_lines
          FROM lineitem GROUP BY 1
        ),
        rated AS (
          SELECT CAST(floor(try_divide(10000 * r_qty, r_lines)) AS BIGINT)
                 AS rate_bp
          FROM per_part
        )
        SELECT CAST(count(*) AS BIGINT) AS n_parts,
               CAST(count(rate_bp) AS BIGINT) AS n_defined,
               CAST(count(*) - count(rate_bp) AS BIGINT) AS n_zero_denominator,
               CAST(sum(rate_bp) AS BIGINT) AS sum_rate_bp
        FROM rated
        """
    )


@query(
    "q_groupby_all_census",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS yr,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum({_CENTS.format(col="l_extendedprice")}) AS BIGINT)
             AS gross_cents
    FROM lineitem GROUP BY ALL ORDER BY ALL
    """,
)
def q_groupby_all_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AK ak6 — ``GROUP BY ALL`` / ``ORDER BY ALL`` resolution: the
    flag/status/year census with both grouping and ordering inferred
    from the projection — the modern-SQL shorthand both engines
    resolve; the hash match certifies they infer the SAME key set and
    the same NULLS-handling order (no NULLs here; ORDER BY ALL is
    leftmost-first in both).

    Scale: identical plan to the explicit-keys spelling — one
    partial-aggregated groupBy to |flags×statuses×years| rows."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(year(l_shipdate) AS BIGINT) AS yr,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum({_CENTS.format(col="l_extendedprice")}) AS BIGINT)
                 AS gross_cents
        FROM lineitem GROUP BY ALL ORDER BY ALL
        """
    )
