"""EXECUTE IMMEDIATE twin-equality for sql_parameterized.

Round-4 VERDICT ask #3: the twin assert used to live inside the registered
callable (three jobs per invocation); it now lives here, and the registered
``sql_parameterized`` runs exactly one job.
"""

from __future__ import annotations

from experiments_datafusion_spark.queries import sqlfrontend
from experiments_datafusion_spark.io import register_views


def test_execute_immediate_matches_parameterized(spark, sf_dir):
    register_views(spark, sf_dir, ("orders",))
    args = {"cutoff": "1995-01-01", "status": "O"}
    bound = spark.sql(sqlfrontend._PARAM_STMT, args=args)
    spark.sql("DECLARE OR REPLACE VARIABLE stmt_txt STRING")
    spark.sql("SET VAR stmt_txt = :s", args={"s": sqlfrontend._PARAM_STMT})
    immediate = spark.sql(
        "EXECUTE IMMEDIATE stmt_txt USING :cutoff AS cutoff, :status AS status",
        args=args,
    )
    a = sorted(map(str, bound.collect()))
    b = sorted(map(str, immediate.collect()))
    assert a, "parameterized query returned no rows on the fixture"
    assert a == b, "EXECUTE IMMEDIATE diverged from parameterized sql()"


def test_registered_fn_single_statement(spark, sf_dir):
    # the registered callable must return the bound statement's result
    df = sqlfrontend.sql_parameterized(spark, sf_dir)
    assert df.columns == ["o_orderpriority", "n", "price_units"]
    assert df.count() > 0


def test_identifier_clause_parameterized_table(spark, sf_dir):
    """Spark 4 IDENTIFIER(:name): parameterize the TABLE NAME itself —
    injection-safe dynamic SQL over identifiers, the half of
    parameterized SQL that value parameters can't reach."""
    register_views(spark, sf_dir, ("orders", "customer"))
    for tbl, key in (("orders", "o_orderkey"), ("customer", "c_custkey")):
        got = spark.sql(
            "SELECT count(*) AS n FROM IDENTIFIER(:tbl)", args={"tbl": tbl}
        ).collect()[0]["n"]
        want = spark.table(tbl).count()
        assert got == want and got > 0
