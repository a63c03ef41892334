"""SQL frontend: CTEs, subqueries (scalar / IN / EXISTS / correlated),
views — run through ``spark.sql`` over temp views so the text-SQL path
(parser -> Catalyst) is exercised, not just the DataFrame DSL
(SURVEY.md §2B rows: Subqueries, CTEs/views)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import register_views
from experiments_datafusion_spark.queries import register


def _sql(spark: SparkSession, sf_dir: str, sql: str, tables=None) -> DataFrame:
    register_views(spark, sf_dir, tables or ("customer", "orders", "lineitem", "nation"))
    return spark.sql(sql)


_SCALAR_SUBQ = """
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
"""


@register("subq_scalar", tags=("sql", "subquery"), oracle=_SCALAR_SUBQ)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate."""
    return _sql(spark, sf_dir, _SCALAR_SUBQ)


_IN_SUBQ = """
SELECT c_custkey, c_name
FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation WHERE n_regionkey = 2
)
"""


@register("subq_in", tags=("sql", "subquery"), oracle=_IN_SUBQ)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (rewritten to semi join by Catalyst)."""
    return _sql(spark, sf_dir, _IN_SUBQ)


_CORR_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
)
AND NOT EXISTS (
  SELECT 1 FROM orders o2
  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P'
)
"""


@register("subq_exists", tags=("sql", "subquery"), oracle=_CORR_EXISTS)
def subq_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS (decorrelated to semi + anti joins)."""
    return _sql(spark, sf_dir, _CORR_EXISTS)


_CORR_SCALAR = """
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders o
WHERE o_totalprice > (
  SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
  WHERE o2.o_custkey = o.o_custkey
)
"""


@register("subq_correlated_scalar", tags=("sql", "subquery"), oracle=_CORR_SCALAR)
def subq_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-group average comparison)."""
    return _sql(spark, sf_dir, _CORR_SCALAR)


_CTE = """
WITH cust_orders AS (
  SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT c.c_custkey, c.c_name, co.n_orders, round(co.spend, 2) AS spend
  FROM customer c JOIN cust_orders co ON c.c_custkey = co.o_custkey
)
SELECT * FROM ranked WHERE n_orders >= 3
"""


@register("cte_chain", tags=("sql", "cte"), oracle=_CTE)
def cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs feeding a join."""
    return _sql(spark, sf_dir, _CTE)


_VIEW_SQL = """
SELECT n_name, count(*) AS n_cust, round(avg(c_acctbal), 4) AS avg_bal
FROM cust_with_nation
GROUP BY n_name
"""


@register(
    "view_logical",
    tags=("sql", "view"),
    oracle="""
WITH cust_with_nation AS (
  SELECT c.*, n.n_name FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT n_name, count(*) AS n_cust, round(avg(c_acctbal), 4) AS avg_bal
FROM cust_with_nation
GROUP BY n_name
""",
)
def view_logical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logical view: a derived temp view queried by a second statement."""
    register_views(spark, sf_dir, ("customer", "nation"))
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW cust_with_nation AS
        SELECT c.*, n.n_name FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        """
    )
    return spark.sql(_VIEW_SQL)


@register(
    "sql_parameterized",
    tags=("sql", "frontend"),
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS price_units
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderstatus = 'O'
GROUP BY o_orderpriority
""",
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL — the injection-safe frontend surface: named
    parameter markers bound via spark.sql(query, args=...).  Parameter
    binding happens at parse time, so Catalyst sees plain literals and
    every pushdown applies exactly as in the static twin.  The EXECUTE
    IMMEDIATE ... USING dynamic-SQL twin of the SAME statement text is
    asserted row-identical in tests/test_sqlfrontend_twins.py (moved out
    of this hot path so the registered callable runs exactly one job)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        _PARAM_STMT, args={"cutoff": "1995-01-01", "status": "O"}
    )


# Shared with tests/test_sqlfrontend_twins.py, which runs the EXECUTE
# IMMEDIATE twin over the same text and asserts row-identity.
_PARAM_STMT = """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS price_units
        FROM orders
        WHERE o_orderdate >= :cutoff AND o_orderstatus = :status
        GROUP BY o_orderpriority
    """


@register(
    "sql_recursive_spine",
    tags=("sql", "frontend", "recursive"),
    oracle="""
WITH RECURSIVE months(m) AS (
  SELECT DATE '1992-01-01'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '1998-12-01'
)
SELECT strftime(m, '%Y-%m-%d') AS month_start,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY m
""",
)
def sql_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 RECURSIVE CTE (WITH RECURSIVE ... UNION ALL): generate the
    1992-01..1998-12 month spine recursively, then LEFT JOIN order counts —
    the classic gap-filled date-spine warehouse pattern, now expressible in
    the text-SQL frontend (no DataFrame sequence()/explode needed).  Spark
    4.1 supports UNION ALL recursion only (UNION_NOT_SUPPORTED_IN_
    RECURSIVE_CTE), so the spine is the honest acyclic use; fixed-point
    algorithms (components, closure) still go through the iterative
    DataFrame operators (operators/graph.py).  Scale: the recursion
    produces 84 driver-side rows; the join/aggregate are the ordinary
    distributed plan."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
WITH RECURSIVE months(m) AS (
  SELECT DATE '1992-01-01'
  UNION ALL
  SELECT m + INTERVAL '1' MONTH FROM months WHERE m < DATE '1998-12-01'
)
SELECT date_format(m, 'yyyy-MM-dd') AS month_start,
       count(o_orderkey) AS n_orders
FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = CAST(m AS TIMESTAMP)
GROUP BY m
""")


@register(
    "sql_scripting_block",
    tags=("sql", "frontend", "scripting"),
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_totalprice > (SELECT max(o_totalprice) * 0.9 FROM orders)
GROUP BY o_orderpriority
""",
)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL SCRIPTING (BEGIN ... END with DECLARE/SET): compute a
    dynamic threshold into a session variable, then run the dependent
    aggregate — the procedural pattern warehouses use for parameterized
    maintenance jobs, expressed entirely in the SQL frontend.  The block's
    LAST statement's result is returned.  Determinism: the threshold is a
    SELECTION (max) scaled by a constant — both engines compute the
    identical double — and money sums use the exact integer-cent recipe."""
    register_views(spark, sf_dir, ("orders",))
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql("""
BEGIN
  DECLARE cutoff DOUBLE DEFAULT 0;
  SET cutoff = (SELECT max(o_totalprice) * 0.9 FROM orders);
  SELECT o_orderpriority,
         count(*) AS n,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM orders
  WHERE o_totalprice > cutoff
  GROUP BY o_orderpriority;
END
""")
