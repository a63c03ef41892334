"""Seeded differential QUERY FUZZER (SQLancer-style TLP-lite): generate
random filter/group/aggregate specs from one AST, lower the SAME spec to
(a) a Spark DataFrame plan and (b) a DuckDB SQL string, and compare
normalized results.  Spec families: filter/group/aggregate (with joins,
HAVING, deterministic ORDER+LIMIT), window functions, set operations
(all six UNION/INTERSECT/EXCEPT forms), and per-row scalar expressions
(string/date/arithmetic/conditional).  This probes the composition space BETWEEN the
hand-written registry keys — random predicate/grouping/aggregate
combinations neither suite enumerates.

Determinism rules mirror the registry conventions (queries/__init__.py):
  * float SUMs go through the exact integer-unit recipe (2dp money);
  * min/max on doubles are selections (bit-identical pass-through);
  * timestamps render as strings; every column aliased identically.

Usage: python tools/fuzz_differential.py [n_specs] [seed] [sf_dir]
Exit code 0 iff every spec matches.  tests/test_fuzz_differential.py runs
a 40-spec pytest version at sf0.001.
"""

from __future__ import annotations

import random
import sys
from dataclasses import dataclass, field
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

# ---- spec space -------------------------------------------------------------

NUM_COLS = {
    "lineitem": [
        ("l_quantity", 1, 50),
        ("l_extendedprice", 900.0, 95000.0),
        ("l_discount", 0.0, 0.1),
        ("l_orderkey", 1, 60000),
        ("l_linenumber", 1, 7),
    ],
    "orders": [
        ("o_totalprice", 900.0, 450000.0),
        ("o_orderkey", 1, 60000),
        ("o_custkey", 1, 15000),
    ],
}
STR_COLS = {
    "lineitem": [
        ("l_returnflag", ["A", "N", "R"]),
        ("l_linestatus", ["F", "O"]),
    ],
    "orders": [
        ("o_orderstatus", ["F", "O", "P"]),
        ("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]),
    ],
}
DATE_COLS = {"lineitem": ["l_shipdate"], "orders": ["o_orderdate"]}
GROUP_COLS = {
    "lineitem": ["l_returnflag", "l_linestatus", "l_linenumber"],
    "orders": ["o_orderstatus", "o_orderpriority"],
}
MONEY_COLS = {  # float cols aggregated via the exact integer-unit recipe
    "lineitem": ["l_extendedprice", "l_quantity"],
    "orders": ["o_totalprice"],
}


@dataclass
class Pred:
    col: str
    op: str  # <, <=, >, >=, =, <>
    lit: object  # number | str | date-string
    kind: str  # num | str | date


@dataclass
class Agg:
    kind: str  # count_star | count | sum_units | min | max | count_distinct
    col: str | None
    alias: str
    filt: "Pred | None" = None  # FILTER (WHERE ...) clause


@dataclass
class Spec:
    table: str
    preds: list[Pred]
    conj: str  # AND | OR
    groupby: list[str]
    aggs: list[Agg] = field(default_factory=list)
    join: str | None = None  # None | inner | left | semi (lineitem->orders)
    join_preds: list[Pred] = field(default_factory=list)  # on the orders side
    having_min_n: int | None = None  # HAVING n >= x
    order_limit: int | None = None  # deterministic ORDER BY n DESC, keys LIMIT k
    grouping: str | None = None  # None | rollup | cube


def gen_spec(rng: random.Random) -> Spec:
    if rng.random() < 0.4:
        return _gen_join_spec(rng)
    table = rng.choice(["lineitem", "orders"])
    preds: list[Pred] = []
    for _ in range(rng.randint(1, 3)):
        r = rng.random()
        if r < 0.5:
            col, lo, hi = rng.choice(NUM_COLS[table])
            lit = round(rng.uniform(lo, hi), 2)
            if isinstance(lo, int) and rng.random() < 0.5:
                lit = int(lit)
            preds.append(Pred(col, rng.choice(["<", "<=", ">", ">=", "<>"]), lit, "num"))
        elif r < 0.8:
            col, vals = rng.choice(STR_COLS[table])
            preds.append(Pred(col, rng.choice(["=", "<>", "<", ">"]), rng.choice(vals), "str"))
        else:
            col = rng.choice(DATE_COLS[table])
            d = f"199{rng.randint(2, 8)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
            preds.append(Pred(col, rng.choice(["<", ">=", ">"]), d, "date"))
    groupby = sorted(
        rng.sample(GROUP_COLS[table], rng.randint(0, min(2, len(GROUP_COLS[table]))))
    )
    aggs = [Agg("count_star", None, "n")]
    pool = [c for c, *_ in NUM_COLS[table]]
    for i in range(rng.randint(1, 3)):
        kind = rng.choice(["sum_units", "min", "max", "count_distinct", "count"])
        col = rng.choice(MONEY_COLS[table] if kind == "sum_units" else pool)
        # conditional-aggregate axis: FILTER (WHERE <pred>) on the extra
        # aggs only — aggs[0] ("n") stays unfiltered because HAVING and the
        # deterministic ORDER BY reference the plain count(*)
        filt = _gen_preds(rng, table, 1)[0] if rng.random() < 0.3 else None
        aggs.append(Agg(kind, col, f"a{i}", filt=filt))
    spec = Spec(table, preds, rng.choice(["AND", "OR"]), groupby, aggs)
    _maybe_having_order(rng, spec)
    if spec.groupby and rng.random() < 0.35:
        # multi-grain axis: the same spec through ROLLUP/CUBE; LIMIT is
        # dropped because subtotal rows have NULL keys and the ORDER BY
        # tiebreaker is no longer a total order across engines
        spec.grouping = rng.choice(["rollup", "cube"])
        spec.order_limit = None
    return spec


def _gen_preds(rng: random.Random, table: str, n: int) -> list[Pred]:
    preds = []
    for _ in range(n):
        r = rng.random()
        if r < 0.4:
            col, lo, hi = rng.choice(NUM_COLS[table])
            lit = round(rng.uniform(lo, hi), 2)
            if isinstance(lo, int) and rng.random() < 0.5:
                lit = int(lit)
            preds.append(Pred(col, rng.choice(["<", "<=", ">", ">="]), lit, "num"))
        elif r < 0.55:  # BETWEEN on a numeric range
            col, lo, hi = rng.choice(NUM_COLS[table])
            a = round(rng.uniform(lo, hi), 2)
            b = round(rng.uniform(lo, hi), 2)
            lo2, hi2 = (a, b) if a <= b else (b, a)
            preds.append(Pred(col, "between", (lo2, hi2), "num_between"))
        elif r < 0.7:
            col, vals = rng.choice(STR_COLS[table])
            preds.append(Pred(col, rng.choice(["=", "<>"]), rng.choice(vals), "str"))
        elif r < 0.82:  # IN-list over a random value subset
            col, vals = rng.choice(STR_COLS[table])
            subset = tuple(sorted(rng.sample(vals, rng.randint(1, min(3, len(vals))))))
            preds.append(Pred(col, "in", subset, "str_in"))
        else:
            col = rng.choice(DATE_COLS[table])
            d = f"199{rng.randint(2, 8)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
            preds.append(Pred(col, rng.choice(["<", ">="]), d, "date"))
    return preds


def _maybe_having_order(rng: random.Random, spec: Spec) -> None:
    if spec.groupby and rng.random() < 0.4:
        spec.having_min_n = rng.randint(2, 50)
    if spec.groupby and rng.random() < 0.4:
        # ORDER BY n DESC + group keys is a TOTAL order (keys unique per
        # output row), so LIMIT is deterministic in both engines
        spec.order_limit = rng.randint(1, 5)


def _gen_join_spec(rng: random.Random) -> Spec:
    """lineitem -> orders on the orderkey: inner / left enrich each
    lineitem row with orders columns; semi reduces to an existence filter."""
    join = rng.choice(["inner", "left", "semi"])
    preds = _gen_preds(rng, "lineitem", rng.randint(1, 2))
    join_preds = _gen_preds(rng, "orders", rng.randint(1, 2))
    group_pool = GROUP_COLS["lineitem"] + ([] if join == "semi" else ["o_orderstatus"])
    groupby = sorted(rng.sample(group_pool, rng.randint(0, 2)))
    aggs = [Agg("count_star", None, "n")]
    pool = [c for c, *_ in NUM_COLS["lineitem"]]
    if join != "semi":
        pool = pool + ["o_totalprice", "o_custkey"]
    for i in range(rng.randint(1, 2)):
        kind = rng.choice(["sum_units", "min", "max", "count", "count_distinct"])
        if kind == "sum_units":
            col = rng.choice(
                MONEY_COLS["lineitem"] + ([] if join == "semi" else ["o_totalprice"])
            )
        else:
            col = rng.choice(pool)
        aggs.append(Agg(kind, col, f"a{i}"))
    spec = Spec("lineitem", preds, "AND", groupby, aggs, join=join, join_preds=join_preds)
    _maybe_having_order(rng, spec)
    return spec


# ---- outer-join specs with NULLABLE join keys (round 5) ---------------------

# The fixture keys are never NULL, so the specs DERIVE nullable keys:
# lk = CASE WHEN l_orderkey % m = 0 THEN NULL END — which makes full/right
# outer padding, NULL-key anti-join survival (NULL never matches, so NOT
# EXISTS keeps the row), and NULL group keys all genuinely exercised.  This
# is the composition space the round-4 EXCEPT lowering bug lived in.


@dataclass
class OJSpec:
    join: str  # full | right | anti
    null_mod_l: int  # l_orderkey % m == 0 -> NULL left key
    null_mod_r: int
    preds: list[Pred]  # lineitem side
    join_preds: list[Pred]  # orders side
    groupby: list[str]  # mixed-side keys; NULL-heavy after outer padding
    aggs: list[Agg] = field(default_factory=list)
    having_min_n: int | None = None


def gen_ojspec(rng: random.Random) -> OJSpec:
    join = rng.choice(["full", "right", "anti"])
    preds = _gen_preds(rng, "lineitem", rng.randint(1, 2))
    join_preds = _gen_preds(rng, "orders", rng.randint(1, 2))
    group_pool = ["l_returnflag", "l_linestatus"] + (
        [] if join == "anti" else ["o_orderstatus", "o_orderpriority"]
    )
    groupby = sorted(rng.sample(group_pool, rng.randint(0, 2)))
    aggs = [Agg("count_star", None, "n")]
    # count(col) is the null-semantics probe: it differs from count(*)
    # exactly on the outer-padded rows
    count_pool = ["l_orderkey", "l_quantity"] + (
        [] if join == "anti" else ["o_orderkey", "o_totalprice"]
    )
    money_pool = MONEY_COLS["lineitem"] + ([] if join == "anti" else ["o_totalprice"])
    for i in range(rng.randint(1, 3)):
        kind = rng.choice(["count", "count", "sum_units", "min", "max", "count_distinct"])
        col = rng.choice(money_pool if kind == "sum_units" else count_pool)
        aggs.append(Agg(kind, col, f"a{i}"))
    spec = OJSpec(
        join,
        rng.choice([2, 3, 5, 13]),
        rng.choice([2, 3, 7]),
        preds,
        join_preds,
        groupby,
        aggs,
    )
    if spec.groupby and rng.random() < 0.4:
        spec.having_min_n = rng.randint(2, 20)
    return spec


def _agg_sql(aggs: list[Agg]) -> list[str]:
    parts = []
    for a in aggs:
        filt = f" FILTER (WHERE {_sql_pred(a.filt)})" if a.filt is not None else ""
        if a.kind == "count_star":
            parts.append(f"CAST(count(*){filt} AS BIGINT) AS {a.alias}")
        elif a.kind == "count":
            parts.append(f"CAST(count({a.col}){filt} AS BIGINT) AS {a.alias}")
        elif a.kind == "count_distinct":
            parts.append(f"CAST(count(DISTINCT {a.col}){filt} AS BIGINT) AS {a.alias}")
        elif a.kind == "sum_units":
            parts.append(
                f"CAST(sum(CAST(round(({a.col}) * 100, 0) AS BIGINT)){filt} AS BIGINT) AS {a.alias}"
            )
        else:
            parts.append(f"{a.kind}({a.col}){filt} AS {a.alias}")
    return parts


def ojspec_to_sql(spec: OJSpec) -> str:
    lc = " AND ".join(_sql_pred(p) for p in spec.preds)
    rc = " AND ".join(_sql_pred(p) for p in spec.join_preds)
    lsub = (
        f"(SELECT *, CASE WHEN l_orderkey % {spec.null_mod_l} = 0 THEN NULL "
        f"ELSE l_orderkey END AS lk FROM lineitem WHERE {lc}) l"
    )
    rsub = (
        f"(SELECT *, CASE WHEN o_orderkey % {spec.null_mod_r} = 0 THEN NULL "
        f"ELSE o_orderkey END AS rk FROM orders WHERE {rc}) r"
    )
    if spec.join == "anti":
        # NOT EXISTS, not NOT IN: Spark's left_anti keeps NULL-key left rows
        # (no match is provable), matching EXISTS semantics; NOT IN would
        # drop EVERY row once the right side contains a NULL key.
        frm = (
            f"{lsub} WHERE NOT EXISTS (SELECT 1 FROM (SELECT o_orderkey AS rk "
            f"FROM orders WHERE ({rc}) AND o_orderkey % {spec.null_mod_r} <> 0) r "
            f"WHERE r.rk = l.lk)"
        )
    elif spec.join == "full":
        frm = f"{lsub} FULL JOIN {rsub} ON l.lk = r.rk"
    else:
        frm = f"{lsub} RIGHT JOIN {rsub} ON l.lk = r.rk"
    parts = _agg_sql(spec.aggs)
    sel = (", ".join(spec.groupby) + ", " if spec.groupby else "") + ", ".join(parts)
    sql = f"SELECT {sel} FROM {frm}"
    if spec.groupby:
        sql += " GROUP BY " + ", ".join(spec.groupby)
    if spec.having_min_n is not None:
        sql += f" HAVING count(*) >= {spec.having_min_n}"
    return sql


def _agg_spark(aggs: list[Agg]):
    out = []
    for a in aggs:
        fc = _spark_cond([a.filt], "AND") if a.filt is not None else None
        wrap = (lambda e: F.when(fc, e)) if fc is not None else (lambda e: e)
        if a.kind == "count_star":
            out.append(F.count(wrap(F.lit(1))).alias(a.alias))
        elif a.kind == "count":
            out.append(F.count(wrap(F.col(a.col))).alias(a.alias))
        elif a.kind == "count_distinct":
            out.append(F.countDistinct(wrap(F.col(a.col))).alias(a.alias))
        elif a.kind == "sum_units":
            out.append(
                F.sum(wrap(F.round(F.col(a.col) * 100, 0).cast("long")))
                .cast("bigint").alias(a.alias)
            )
        elif a.kind == "min":
            out.append(F.min(wrap(F.col(a.col))).alias(a.alias))
        else:
            out.append(F.max(wrap(F.col(a.col))).alias(a.alias))
    return out


def ojspec_to_spark(spec: OJSpec, lineitem, orders):
    left = lineitem.where(_spark_cond(spec.preds, "AND")).withColumn(
        "lk",
        F.when(F.col("l_orderkey") % spec.null_mod_l != 0, F.col("l_orderkey")),
    )
    right = orders.where(_spark_cond(spec.join_preds, "AND")).withColumn(
        "rk",
        F.when(F.col("o_orderkey") % spec.null_mod_r != 0, F.col("o_orderkey")),
    )
    if spec.join == "anti":
        out = left.join(
            right.where(F.col("rk").isNotNull()),
            left["lk"] == right["rk"],
            "left_anti",
        )
    else:
        how = {"full": "full", "right": "right"}[spec.join]
        out = left.join(right, left["lk"] == right["rk"], how)
    grouped = out.groupBy(*spec.groupby) if spec.groupby else out.groupBy()
    res = grouped.agg(*_agg_spark(spec.aggs))
    if spec.having_min_n is not None:
        res = res.where(F.col("n") >= spec.having_min_n)
    return res


# ---- GROUPING SETS specs (round 5) ------------------------------------------


@dataclass
class GSSpec:
    """Explicit GROUPING SETS over 2-3 keys, with per-key grouping() flags
    so subtotal-NULLs and (hypothetical) data-NULLs stay distinguishable —
    the multi-grain axis rollup/cube can't reach (arbitrary set lists,
    including disjoint sets and the empty grand-total set)."""

    table: str
    preds: list[Pred]
    keys: list[str]
    sets: list[tuple[str, ...]]
    aggs: list[Agg] = field(default_factory=list)


def gen_gsspec(rng: random.Random) -> GSSpec:
    table = rng.choice(["lineitem", "orders"])
    pool = sorted(
        rng.sample(GROUP_COLS[table], rng.randint(2, min(3, len(GROUP_COLS[table]))))
    )
    # powerset sample: always >= 2 distinct sets, dedup'd, order-stable
    pow_all = []
    for mask in range(1 << len(pool)):
        pow_all.append(tuple(k for j, k in enumerate(pool) if mask >> j & 1))
    n_sets = rng.randint(2, min(4, len(pow_all)))
    sets = sorted(set(tuple(s) for s in rng.sample(pow_all, n_sets)))
    # DuckDB binds grouping(k) / bare k only for keys present in >= 1 set;
    # restrict the key list to the union of the sampled sets
    keys = sorted({k for s in sets for k in s})
    if not keys:  # both sampled sets were () — degenerate; use the full pool
        keys, sets = pool, sorted({tuple(pool), ()})
    preds = _gen_preds(rng, table, rng.randint(1, 2))
    aggs = [Agg("count_star", None, "n")]
    pool = [c for c, *_ in NUM_COLS[table]]
    for i in range(rng.randint(1, 2)):
        kind = rng.choice(["sum_units", "min", "max", "count"])
        col = rng.choice(MONEY_COLS[table] if kind == "sum_units" else pool)
        aggs.append(Agg(kind, col, f"a{i}"))
    return GSSpec(table, preds, keys, sets, aggs)


def gsspec_to_sql(spec: GSSpec) -> str:
    conds = " AND ".join(_sql_pred(p) for p in spec.preds)
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in spec.sets)
    flags = [f"CAST(grouping({k}) AS BIGINT) AS g_{k}" for k in spec.keys]
    parts = _agg_sql(spec.aggs)
    sel = ", ".join(spec.keys + flags + parts)
    return (
        f"SELECT {sel} FROM {spec.table} WHERE {conds} "
        f"GROUP BY GROUPING SETS ({sets_sql})"
    )


def gsspec_to_spark(spec: GSSpec, df):
    out = df.where(_spark_cond(spec.preds, "AND"))
    grouped = out.groupingSets(
        [[F.col(k) for k in s] for s in spec.sets],
        *[F.col(k) for k in spec.keys],
    )
    flags = [
        F.grouping(k).cast("bigint").alias(f"g_{k}") for k in spec.keys
    ]
    return grouped.agg(*flags, *_agg_spark(spec.aggs))


# ---- correlated-subquery specs (round 7) -------------------------------------
#
# Scalar / EXISTS / NOT EXISTS subqueries over lineitem correlated to each
# orders row on the orderkey PLUS a non-equi cross-table predicate
# (l_shipdate > o_orderdate), so decorrelation is genuinely exercised: the
# Spark lowering is the standard rewrite (scalar-agg -> outer-key left join
# + group; EXISTS -> left_semi; NOT EXISTS -> left_anti with the compound
# condition), compared against the engines' native correlated planners.


@dataclass
class CorrSpec:
    kind: str  # scalar_count | scalar_max | scalar_sum_units | exists | not_exists
    opreds: list[Pred]  # outer (orders) side
    lpreds: list[Pred]  # inner (lineitem) side
    nonequi: bool  # add l_shipdate > o_orderdate to the correlation


def gen_corrspec(rng: random.Random) -> CorrSpec:
    kind = rng.choice(
        ["scalar_count", "scalar_max", "scalar_sum_units", "exists", "not_exists"]
    )
    return CorrSpec(
        kind,
        _gen_preds(rng, "orders", rng.randint(1, 2)),
        _gen_preds(rng, "lineitem", rng.randint(1, 2)),
        rng.random() < 0.6,
    )


def corrspec_to_sql(spec: CorrSpec) -> str:
    oc = " AND ".join(_sql_pred(p) for p in spec.opreds)
    lc = " AND ".join(_sql_pred(p) for p in spec.lpreds)
    corr = "l.l_orderkey = o.o_orderkey"
    if spec.nonequi:
        corr += " AND l.l_shipdate > o.o_orderdate"
    inner = f"FROM lineitem l WHERE {corr} AND ({lc})"
    if spec.kind == "exists":
        return (
            f"SELECT o_orderkey, o_orderstatus FROM orders o "
            f"WHERE ({oc}) AND EXISTS (SELECT 1 {inner})"
        )
    if spec.kind == "not_exists":
        return (
            f"SELECT o_orderkey, o_orderstatus FROM orders o "
            f"WHERE ({oc}) AND NOT EXISTS (SELECT 1 {inner})"
        )
    sub = {
        "scalar_count": "CAST(count(*) AS BIGINT)",
        "scalar_max": "max(l.l_quantity)",
        "scalar_sum_units": "CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)",
    }[spec.kind]
    return (
        f"SELECT o_orderkey, o_orderstatus, (SELECT {sub} {inner}) AS sub_v "
        f"FROM orders o WHERE {oc}"
    )


def corrspec_to_spark(spec: CorrSpec, lineitem, orders):
    o = orders.where(_spark_cond(spec.opreds, "AND"))
    li = lineitem.where(_spark_cond(spec.lpreds, "AND"))
    cond = li["l_orderkey"] == o["o_orderkey"]
    if spec.nonequi:
        cond = cond & (li["l_shipdate"] > o["o_orderdate"])
    if spec.kind in ("exists", "not_exists"):
        how = "left_semi" if spec.kind == "exists" else "left_anti"
        return o.join(li, cond, how).select("o_orderkey", "o_orderstatus")
    # scalar-agg decorrelation: left join, group by the outer row key, then
    # aggregate ONLY inner columns — count(inner) is 0 and max/sum NULL for
    # unmatched outer rows, exactly the scalar subquery's semantics
    agg = {
        "scalar_count": F.count(li["l_partkey"]).cast("bigint"),
        "scalar_max": F.max(li["l_quantity"]),
        "scalar_sum_units": F.sum(
            F.round(li["l_extendedprice"] * 100, 0).cast("long")
        ).cast("bigint"),
    }[spec.kind]
    return (
        o.join(li, cond, "left")
        .groupBy(o["o_orderkey"], o["o_orderstatus"])
        .agg(agg.alias("sub_v"))
    )


# ---- set ops over DERIVED NULLABLE columns (round 7) --------------------------
#
# The round-5 outer-join axis derives nullable JOIN keys; this axis derives
# nullable SET-OP columns — INTERSECT/EXCEPT [ALL] treat NULLs as EQUAL
# (distinct semantics), the opposite of join/WHERE NULL semantics, which is
# exactly where lowering bugs live (the round-4 EXCEPT bug's composition
# space).  Columns: two CASE-derived nullable strings + whole-valued qty.


@dataclass
class NullSetSpec:
    op: str  # key of SETOPS
    preds_a: list[Pred]
    preds_b: list[Pred]
    null_mod_f: int  # l_orderkey % m == 0 -> NULL flag column
    null_mod_s: int  # l_linenumber % m == 0 -> NULL status column


def gen_nullsetspec(rng: random.Random) -> NullSetSpec:
    return NullSetSpec(
        rng.choice(sorted(SETOPS)),
        _gen_preds(rng, "lineitem", rng.randint(1, 2)),
        _gen_preds(rng, "lineitem", rng.randint(1, 2)),
        rng.choice([2, 3, 5]),
        rng.choice([2, 3]),
    )


def _nullset_cols_sql(spec: NullSetSpec) -> str:
    return (
        f"CASE WHEN l_orderkey % {spec.null_mod_f} = 0 THEN NULL "
        f"ELSE l_returnflag END AS f, "
        f"CASE WHEN l_linenumber % {spec.null_mod_s} = 0 THEN NULL "
        f"ELSE l_linestatus END AS s, "
        f"CAST(l_quantity AS INT) AS qty"
    )


def nullsetspec_to_sql(spec: NullSetSpec) -> str:
    ca = " AND ".join(_sql_pred(p) for p in spec.preds_a)
    cb = " AND ".join(_sql_pred(p) for p in spec.preds_b)
    cols = _nullset_cols_sql(spec)
    return (
        "SELECT f, s, qty, CAST(count(*) AS BIGINT) AS n FROM ("
        f"SELECT {cols} FROM lineitem WHERE {ca} "
        f"{SETOPS[spec.op]} "
        f"SELECT {cols} FROM lineitem WHERE {cb}"
        ") GROUP BY 1, 2, 3"
    )


def nullsetspec_to_spark(spec: NullSetSpec, df):
    def side(preds):
        return df.where(_spark_cond(preds, "AND")).select(
            F.when(F.col("l_orderkey") % spec.null_mod_f != 0, F.col("l_returnflag"))
            .alias("f"),
            F.when(F.col("l_linenumber") % spec.null_mod_s != 0, F.col("l_linestatus"))
            .alias("s"),
            F.col("l_quantity").cast("int").alias("qty"),
        )

    a, b = side(spec.preds_a), side(spec.preds_b)
    combined = {
        "union_all": lambda: a.unionByName(b),
        "union": lambda: a.unionByName(b).distinct(),
        "intersect": lambda: a.intersect(b),
        "intersect_all": lambda: a.intersectAll(b),
        "except": lambda: a.subtract(b),
        "except_all": lambda: a.exceptAll(b),
    }[spec.op]()
    return combined.groupBy("f", "s", "qty").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


# ---- window-function specs --------------------------------------------------

WIN_FUNCS = ("row_number", "rank", "dense_rank", "lag", "lead", "sum_units_frame", "min_frame")


@dataclass
class WSpec:
    """Window-function spec over lineitem: deterministic TOTAL order
    (price, orderkey, linenumber) inside random partitions."""

    preds: list[Pred]
    partition: list[str]
    funcs: list[tuple[str, str | None, int, str]]  # (kind, col, param, alias)


def gen_wspec(rng: random.Random) -> WSpec:
    preds = _gen_preds(rng, "lineitem", rng.randint(1, 2))
    partition = sorted(
        rng.sample(GROUP_COLS["lineitem"], rng.randint(1, 2))
    )
    funcs = []
    for i in range(rng.randint(1, 3)):
        kind = rng.choice(WIN_FUNCS)
        col = None
        param = 0
        if kind in ("lag", "lead"):
            col = rng.choice(["l_quantity", "l_extendedprice", "l_orderkey"])
            param = rng.randint(1, 3)
        elif kind == "sum_units_frame":
            col = rng.choice(MONEY_COLS["lineitem"])
            param = rng.randint(1, 5)  # ROWS k PRECEDING .. CURRENT
        elif kind == "min_frame":
            col = rng.choice(["l_quantity", "l_extendedprice"])
            param = rng.randint(1, 5)
        funcs.append((kind, col, param, f"w{i}"))
    return WSpec(preds, partition, funcs)


_WORDER = "l_extendedprice, l_orderkey, l_linenumber"  # total order


def wspec_to_sql(spec: WSpec) -> str:
    conds = " AND ".join(_sql_pred(p) for p in spec.preds)
    over = f"OVER (PARTITION BY {', '.join(spec.partition)} ORDER BY {_WORDER}"
    parts = []
    for kind, col, param, alias in spec.funcs:
        if kind in ("row_number", "rank", "dense_rank"):
            parts.append(f"CAST({kind}() {over}) AS BIGINT) AS {alias}")
        elif kind in ("lag", "lead"):
            parts.append(f"{kind}({col}, {param}) {over}) AS {alias}")
        elif kind == "sum_units_frame":
            parts.append(
                f"CAST(sum(CAST(round(({col}) * 100, 0) AS BIGINT)) "
                f"{over} ROWS BETWEEN {param} PRECEDING AND CURRENT ROW) AS BIGINT) AS {alias}"
            )
        else:  # min_frame
            parts.append(
                f"min({col}) {over} ROWS BETWEEN {param} PRECEDING AND CURRENT ROW) AS {alias}"
            )
    keys = "l_orderkey, l_linenumber"
    return (
        f"SELECT {keys}, {', '.join(parts)} FROM lineitem WHERE {conds}"
    )


def wspec_to_spark(spec: WSpec, df):
    from pyspark.sql import Window

    out = df.where(_spark_cond(spec.preds, "AND"))
    base = Window.partitionBy(*spec.partition).orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    cols = [F.col("l_orderkey"), F.col("l_linenumber")]
    for kind, col, param, alias in spec.funcs:
        if kind == "row_number":
            c = F.row_number().over(base).cast("bigint")
        elif kind == "rank":
            c = F.rank().over(base).cast("bigint")
        elif kind == "dense_rank":
            c = F.dense_rank().over(base).cast("bigint")
        elif kind == "lag":
            c = F.lag(col, param).over(base)
        elif kind == "lead":
            c = F.lead(col, param).over(base)
        elif kind == "sum_units_frame":
            w = base.rowsBetween(-param, 0)
            c = F.sum(F.round(F.col(col) * 100, 0).cast("long")).over(w).cast("bigint")
        else:
            w = base.rowsBetween(-param, 0)
            c = F.min(col).over(w)
        cols.append(c.alias(alias))
    return out.select(*cols)


# ---- set-operation specs ----------------------------------------------------

SETOPS = {  # spark method name -> SQL keyword
    "union_all": "UNION ALL",
    "union": "UNION",
    "intersect": "INTERSECT",
    "intersect_all": "INTERSECT ALL",
    "except": "EXCEPT",
    "except_all": "EXCEPT ALL",
}
# low-cardinality projection so INTERSECT/EXCEPT branches genuinely overlap;
# l_quantity is whole-valued, so the int cast can't hit the round-vs-truncate
# divergence between engines
_SET_COLS = "l_returnflag, l_linestatus, l_linenumber, CAST(l_quantity AS INT) AS qty"


@dataclass
class SetSpec:
    op: str  # key of SETOPS
    preds_a: list[Pred]
    preds_b: list[Pred]


def gen_setspec(rng: random.Random) -> SetSpec:
    return SetSpec(
        rng.choice(sorted(SETOPS)),
        _gen_preds(rng, "lineitem", rng.randint(1, 2)),
        _gen_preds(rng, "lineitem", rng.randint(1, 2)),
    )


def setspec_to_sql(spec: SetSpec) -> str:
    ca = " AND ".join(_sql_pred(p) for p in spec.preds_a)
    cb = " AND ".join(_sql_pred(p) for p in spec.preds_b)
    return (
        "SELECT l_returnflag, l_linestatus, l_linenumber, qty, "
        "CAST(count(*) AS BIGINT) AS n FROM ("
        f"SELECT {_SET_COLS} FROM lineitem WHERE {ca} "
        f"{SETOPS[spec.op]} "
        f"SELECT {_SET_COLS} FROM lineitem WHERE {cb}"
        ") GROUP BY 1, 2, 3, 4"
    )


def setspec_to_spark(spec: SetSpec, df):
    def side(preds):
        return df.where(_spark_cond(preds, "AND")).select(
            "l_returnflag",
            "l_linestatus",
            "l_linenumber",
            F.col("l_quantity").cast("int").alias("qty"),
        )

    a, b = side(spec.preds_a), side(spec.preds_b)
    combined = {
        "union_all": lambda: a.unionByName(b),
        "union": lambda: a.unionByName(b).distinct(),
        "intersect": lambda: a.intersect(b),
        "intersect_all": lambda: a.intersectAll(b),
        # subtract == EXCEPT DISTINCT; exceptAll().distinct() is WRONG (a
        # row with more copies in a than b would survive the multiset
        # difference and the dedup, but SQL EXCEPT drops any row present in
        # b).  The fuzzer itself caught this lowering bug (seeds 1001,
        # 31337 at sf0.01).
        "except": lambda: a.subtract(b),
        "except_all": lambda: a.exceptAll(b),
    }[spec.op]()
    return combined.groupBy(
        "l_returnflag", "l_linestatus", "l_linenumber", "qty"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


# ---- scalar-expression specs ------------------------------------------------

SCALAR_KINDS = (
    "concat_flags", "yearmonth", "mod_units", "case_qty",
    "substr_key", "len_key", "greatest2", "coalesce_nullif",
)


@dataclass
class SSpec:
    """Per-row scalar-expression spec over lineitem: deterministic string /
    integer / date expressions keyed by (orderkey, linenumber)."""

    preds: list[Pred]
    exprs: list[tuple[str, int, str]]  # (kind, param, alias)


def gen_sspec(rng: random.Random) -> SSpec:
    preds = _gen_preds(rng, "lineitem", rng.randint(1, 2))
    kinds = rng.sample(SCALAR_KINDS, rng.randint(2, 4))
    exprs = []
    for i, kind in enumerate(kinds):
        param = {
            "mod_units": rng.choice([7, 31, 97]),
            "case_qty": rng.randint(10, 40),
            "substr_key": rng.randint(1, 4),
        }.get(kind, 0)
        exprs.append((kind, param, f"s{i}"))
    return SSpec(preds, exprs)


_SCALAR_SQL = {
    "concat_flags": lambda p: "upper(l_returnflag) || '-' || l_linestatus",
    "yearmonth": lambda p: "CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)",
    "mod_units": lambda p: f"CAST(round(l_extendedprice * 100, 0) AS BIGINT) % {p}",
    "case_qty": lambda p: f"CASE WHEN l_quantity < {p} THEN 'lo' ELSE 'hi' END",
    "substr_key": lambda p: f"substr(CAST(l_orderkey AS VARCHAR), 1, {p})",
    "len_key": lambda p: "CAST(length(CAST(l_partkey AS VARCHAR)) AS BIGINT)",
    "greatest2": lambda p: "CAST(greatest(l_quantity, l_linenumber * 10) AS BIGINT)",
    "coalesce_nullif": lambda p: "coalesce(nullif(l_returnflag, 'A'), 'x')",
}


def _scalar_spark(kind: str, p: int):
    if kind == "concat_flags":
        return F.concat(F.upper("l_returnflag"), F.lit("-"), F.col("l_linestatus"))
    if kind == "yearmonth":
        return (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("bigint")
    if kind == "mod_units":
        return (F.round(F.col("l_extendedprice") * 100, 0).cast("bigint") % p)
    if kind == "case_qty":
        return F.when(F.col("l_quantity") < p, "lo").otherwise("hi")
    if kind == "substr_key":
        return F.substring(F.col("l_orderkey").cast("string"), 1, p)
    if kind == "len_key":
        return F.length(F.col("l_partkey").cast("string")).cast("bigint")
    if kind == "greatest2":
        return F.greatest(F.col("l_quantity"), F.col("l_linenumber") * 10).cast("bigint")
    return F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("A")), F.lit("x"))


def sspec_to_sql(spec: SSpec) -> str:
    conds = " AND ".join(_sql_pred(p) for p in spec.preds)
    parts = [f"{_SCALAR_SQL[k](p)} AS {alias}" for k, p, alias in spec.exprs]
    return (
        f"SELECT l_orderkey, l_linenumber, {', '.join(parts)} "
        f"FROM lineitem WHERE {conds}"
    )


def sspec_to_spark(spec: SSpec, df):
    out = df.where(_spark_cond(spec.preds, "AND"))
    cols = [F.col("l_orderkey"), F.col("l_linenumber")]
    cols += [_scalar_spark(k, p).alias(alias) for k, p, alias in spec.exprs]
    return out.select(*cols)


# ---- decimal-arithmetic specs (round 9) ---------------------------------------
#
# The axis that randomizes the int128/decimal accumulation family behind the
# r4 1-ulp skew: every expression is computed in DECIMAL (never double) and
# lands in exact integer units, so any divergence is an engine bug or a
# broken parity recipe, never float noise.  Conventions encoded (both
# engines verified): double->DECIMAL casts round to nearest; round() on
# positive decimals is half-up in Spark and half-away in DuckDB (equal for
# positives); exact quotients use the scaled-integer // recipe, never
# decimal division (result-scale rules differ between engines).

DEC_KINDS = ("disc_price_units", "charge_units", "ratio_div_micro", "price_band")


@dataclass
class DecSpec:
    preds: list[Pred]
    exprs: list[tuple[str, int, str]]  # (kind, param, alias)
    group: str | None  # None = per-row projection; else grouped decimal SUMs


def gen_decspec(rng: random.Random) -> DecSpec:
    preds = _gen_preds(rng, "lineitem", rng.randint(1, 2))
    kinds = rng.sample(DEC_KINDS, rng.randint(2, 4))
    exprs = []
    for i, kind in enumerate(kinds):
        param = {
            "ratio_div_micro": rng.choice([10_000, 1_000_000]),
            "price_band": rng.randint(20_000, 70_000),
        }.get(kind, 0)
        exprs.append((kind, param, f"d{i}"))
    group = rng.choice([None, "l_returnflag", "l_linestatus"])
    return DecSpec(preds, exprs, group)


_P = "CAST(l_extendedprice AS DECIMAL(12,2))"
_D = "CAST(l_discount AS DECIMAL(4,2))"
_T = "CAST(l_tax AS DECIMAL(4,2))"

_DEC_SQL = {
    "disc_price_units": lambda p: f"CAST(round({_P} * (1 - {_D}), 2) * 100 AS BIGINT)",
    "charge_units": lambda p: (
        f"CAST(round({_P} * (1 - {_D}) * (1 + {_T}), 2) * 100 AS BIGINT)"
    ),
    # exact quotient: scaled-integer // (DuckDB // truncates toward zero,
    # Spark `div` likewise for positives) — never decimal division
    "ratio_div_micro": lambda p: (
        f"(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * {p})"
        f" // CAST(l_quantity AS BIGINT)"
    ),
    "price_band": lambda p: (
        f"CASE WHEN {_P} > {p} THEN 'hi' WHEN {_P} > {p // 2} THEN 'mid'"
        f" ELSE 'lo' END"
    ),
}


def _dec_spark(kind: str, p: int):
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    if kind == "disc_price_units":
        return (F.round(price * (F.lit(1) - disc), 2) * 100).cast("bigint")
    if kind == "charge_units":
        return (
            F.round(price * (F.lit(1) - disc) * (F.lit(1) + tax), 2) * 100
        ).cast("bigint")
    if kind == "ratio_div_micro":
        return F.expr(
            f"(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * {p})"
            f" div CAST(l_quantity AS BIGINT)"
        )
    return (
        F.when(price > p, "hi").when(price > p // 2, "mid").otherwise("lo")
    )


def decspec_to_sql(spec: DecSpec) -> str:
    conds = " AND ".join(_sql_pred(p) for p in spec.preds)
    if spec.group is None:
        parts = [f"{_DEC_SQL[k](p)} AS {alias}" for k, p, alias in spec.exprs]
        return (
            f"SELECT l_orderkey, l_linenumber, {', '.join(parts)} "
            f"FROM lineitem WHERE {conds}"
        )
    # grouped: decimal SUM accumulation (the int128-skew family) — the sum
    # runs in DECIMAL and is scaled to integer units only at the end
    parts = [
        f"CAST(sum({_DEC_SQL[k](p)}) AS BIGINT) AS {alias}"
        for k, p, alias in spec.exprs
        if k != "price_band"
    ] or [f"CAST(sum({_DEC_SQL['disc_price_units'](0)}) AS BIGINT) AS d0"]
    return (
        f"SELECT {spec.group}, count(*) AS n, {', '.join(parts)} "
        f"FROM lineitem WHERE {conds} GROUP BY {spec.group}"
    )


def decspec_to_spark(spec: DecSpec, df):
    out = df.where(_spark_cond(spec.preds, "AND"))
    if spec.group is None:
        cols = [F.col("l_orderkey"), F.col("l_linenumber")]
        cols += [_dec_spark(k, p).alias(alias) for k, p, alias in spec.exprs]
        return out.select(*cols)
    aggs = [
        F.sum(_dec_spark(k, p)).cast("bigint").alias(alias)
        for k, p, alias in spec.exprs
        if k != "price_band"
    ] or [F.sum(_dec_spark("disc_price_units", 0)).cast("bigint").alias("d0")]
    return out.groupBy(spec.group).agg(F.count(F.lit(1)).alias("n"), *aggs)


# ---- datetime-convention specs (round 9) ---------------------------------------
#
# The axis that randomizes the calendar-convention family behind the r4/r5
# dayofweek/date_diff findings.  Every kind pairs Spark's spelling with the
# DuckDB spelling of the SAME fact, with the convention delta corrected in
# the SQL: Spark dayofweek is 1=Sunday while DuckDB's is 0=Sunday (+1);
# Spark weekday is 0=Monday while DuckDB isodow is 1=Monday; datediff /
# date_diff('day') both count boundary crossings for DATEs; add_months and
# +INTERVAL MONTH both clamp to month end.

DT_KINDS = (
    "dow_sunday", "dow_iso", "ship_delay_days", "week_iso",
    "month_add_clamp", "trunc_week_monday", "unix_days", "day_bucket",
    "quarter_key", "last_day_of_month",
)


@dataclass
class DtSpec:
    preds: list[Pred]
    exprs: list[tuple[str, int, str]]  # (kind, param, alias)


def gen_dtspec(rng: random.Random) -> DtSpec:
    preds = _gen_preds(rng, "lineitem", rng.randint(1, 2))
    kinds = rng.sample(DT_KINDS, rng.randint(2, 4))
    exprs = []
    for i, kind in enumerate(kinds):
        param = {
            "month_add_clamp": rng.randint(1, 11),
            "day_bucket": rng.choice([3, 7, 30]),
        }.get(kind, 0)
        exprs.append((kind, param, f"t{i}"))
    return DtSpec(preds, exprs)


# the fixture ships l_shipdate as TIMESTAMP_NTZ; every kind goes through an
# explicit DATE cast in BOTH engines so the calendar functions see the same
# type (Spark unix_date/trunc require DATE; DuckDB is laxer, which would
# otherwise hide a convention mismatch behind an implicit coercion)
_DT_D = "CAST(l_shipdate AS DATE)"
_DT_ANCHOR = "1998-12-01"  # the fixture has one date column; delays anchor here

_DT_SQL = {
    # DuckDB dayofweek: 0=Sunday; Spark: 1=Sunday -> +1 aligns them
    "dow_sunday": lambda p: f"CAST(dayofweek({_DT_D}) + 1 AS BIGINT)",
    # ISO weekday 1=Mon..7=Sun: DuckDB isodow vs Spark weekday()+1
    "dow_iso": lambda p: f"CAST(isodow({_DT_D}) AS BIGINT)",
    "ship_delay_days": lambda p: (
        f"CAST(date_diff('day', {_DT_D}, DATE '{_DT_ANCHOR}') AS BIGINT)"
    ),
    "week_iso": lambda p: f"CAST(weekofyear({_DT_D}) AS BIGINT)",
    "month_add_clamp": lambda p: (
        f"CAST({_DT_D} + INTERVAL {p} MONTH AS DATE)"
    ),
    "trunc_week_monday": lambda p: f"CAST(date_trunc('week', {_DT_D}) AS DATE)",
    "unix_days": lambda p: (
        f"CAST(date_diff('day', DATE '1970-01-01', {_DT_D}) AS BIGINT)"
    ),
    "day_bucket": lambda p: (
        f"CAST(date_diff('day', DATE '1970-01-01', {_DT_D}) // {p} AS BIGINT)"
    ),
    "quarter_key": lambda p: (
        f"CAST(year({_DT_D}) * 10 + quarter({_DT_D}) AS BIGINT)"
    ),
    "last_day_of_month": lambda p: f"last_day({_DT_D})",
}


def _dt_spark(kind: str, p: int):
    d = F.col("l_shipdate").cast("date")
    if kind == "dow_sunday":
        return F.dayofweek(d).cast("bigint")
    if kind == "dow_iso":
        return (F.weekday(d) + 1).cast("bigint")
    if kind == "ship_delay_days":
        return F.datediff(F.lit(_DT_ANCHOR).cast("date"), d).cast("bigint")
    if kind == "week_iso":
        return F.weekofyear(d).cast("bigint")
    if kind == "month_add_clamp":
        return F.add_months(d, p)
    if kind == "trunc_week_monday":
        return F.trunc(d, "week")
    if kind == "unix_days":
        return F.unix_date(d).cast("bigint")
    if kind == "day_bucket":
        return F.expr(
            f"unix_date(CAST(l_shipdate AS DATE)) div {p}"
        ).cast("bigint")
    if kind == "quarter_key":
        return (F.year(d) * 10 + F.quarter(d)).cast("bigint")
    return F.last_day(d)


def dtspec_to_sql(spec: DtSpec) -> str:
    conds = " AND ".join(_sql_pred(p) for p in spec.preds)
    parts = [f"{_DT_SQL[k](p)} AS {alias}" for k, p, alias in spec.exprs]
    return (
        f"SELECT l_orderkey, l_linenumber, {', '.join(parts)} "
        f"FROM lineitem WHERE {conds}"
    )


def dtspec_to_spark(spec: DtSpec, df):
    out = df.where(_spark_cond(spec.preds, "AND"))
    cols = [F.col("l_orderkey"), F.col("l_linenumber")]
    cols += [_dt_spark(k, p).alias(alias) for k, p, alias in spec.exprs]
    return out.select(*cols)


# ---- window-FRAME specs (round 10) -------------------------------------------
#
# The composition family behind win_range_time / win_rolling_median that the
# fuzzer lacked (r9 verdict #7): value-based RANGE frames over event time —
# both the epoch-seconds numeric form and the INTERVAL form — and sliding
# ROWS frames with MIXED aggregates, all under a DERIVED NULLABLE partition
# key.  Both engines must co-partition NULL keys and agree on frame
# membership at tie boundaries (RANGE includes all ORDER-BY peers; ROWS
# needs the total-order tiebreak both sides spell identically).

FRAME_AGGS = ("sum_units", "count_star", "min_units", "max_units", "count_pk")


@dataclass
class FrameSpec:
    null_mod: int  # pk NULL where o_custkey % null_mod = 0 ...
    part_mod: int  # ... else o_custkey % part_mod
    form: str  # range_epoch | range_interval | rows_sliding
    lo: int  # PRECEDING bound (days for range, rows for rows)
    hi: int  # FOLLOWING bound (0 = CURRENT ROW)
    aggs: list[tuple[str, str]]  # (kind, alias)


def gen_framespec(rng: random.Random) -> FrameSpec:
    form = rng.choice(("range_epoch", "range_interval", "rows_sliding"))
    if form.startswith("range"):
        lo, hi = rng.randint(1, 90), rng.choice((0, rng.randint(1, 45)))
    else:
        lo, hi = rng.randint(1, 6), rng.choice((0, rng.randint(1, 4)))
    kinds = rng.sample(FRAME_AGGS, rng.randint(2, 4))
    return FrameSpec(
        rng.choice((7, 13, 29)),
        rng.choice((5, 11, 23)),
        form,
        lo,
        hi,
        [(k, f"a{i}") for i, k in enumerate(kinds)],
    )


# shared projection: nullable partition key, UTC epoch seconds, exact units.
# Spark reads o_orderdate as TIMESTAMP_NTZ; the cast to session-tz timestamp
# (session tz = UTC) makes unix_timestamp() equal DuckDB's epoch() on the
# naive value.
_FRAME_CTE = """
t AS (
  SELECT o_orderkey,
         CASE WHEN o_custkey % {nm} = 0 THEN NULL
              ELSE o_custkey % {pm} END AS pk,
         o_orderdate,
         CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS units
  FROM orders
)
"""

_FRAME_AGG_SQL = {
    "sum_units": "CAST(sum(units) OVER w AS BIGINT)",
    "count_star": "CAST(count(*) OVER w AS BIGINT)",
    "min_units": "CAST(min(units) OVER w AS BIGINT)",
    "max_units": "CAST(max(units) OVER w AS BIGINT)",
    "count_pk": "CAST(count(pk) OVER w AS BIGINT)",
}


def _frame_clause_sql(spec: FrameSpec) -> str:
    if spec.form == "range_epoch":
        upper = "CURRENT ROW" if spec.hi == 0 else f"{spec.hi * 86400} FOLLOWING"
        return (
            f"ORDER BY epoch_s RANGE BETWEEN {spec.lo * 86400} PRECEDING AND {upper}"
        )
    if spec.form == "range_interval":
        upper = (
            "CURRENT ROW" if spec.hi == 0 else f"INTERVAL '{spec.hi}' DAY FOLLOWING"
        )
        return (
            f"ORDER BY o_orderdate RANGE BETWEEN INTERVAL '{spec.lo}' DAY "
            f"PRECEDING AND {upper}"
        )
    upper = "CURRENT ROW" if spec.hi == 0 else f"{spec.hi} FOLLOWING"
    return (
        f"ORDER BY o_orderdate, o_orderkey ROWS BETWEEN {spec.lo} "
        f"PRECEDING AND {upper}"
    )


def framespec_to_sql(spec: FrameSpec) -> str:
    cte = _FRAME_CTE.format(nm=spec.null_mod, pm=spec.part_mod)
    parts = [f"{_FRAME_AGG_SQL[k]} AS {alias}" for k, alias in spec.aggs]
    return (
        f"WITH {cte} SELECT o_orderkey, pk, {', '.join(parts)} FROM t "
        f"WINDOW w AS (PARTITION BY pk {_frame_clause_sql(spec)})"
    )


def framespec_to_spark(spec: FrameSpec, orders):
    from pyspark.sql import Window

    pk = F.when(F.col("o_custkey") % spec.null_mod == 0, F.lit(None)).otherwise(
        F.col("o_custkey") % spec.part_mod
    )
    t = orders.select(
        "o_orderkey",
        pk.alias("pk"),
        F.col("o_orderdate").cast("timestamp").alias("ots"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
        .cast("bigint")
        .alias("epoch_s"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("units"),
    )
    agg_col = {
        "sum_units": lambda w: F.sum("units").over(w).cast("bigint"),
        "count_star": lambda w: F.count(F.lit(1)).over(w).cast("bigint"),
        "min_units": lambda w: F.min("units").over(w).cast("bigint"),
        "max_units": lambda w: F.max("units").over(w).cast("bigint"),
        "count_pk": lambda w: F.count("pk").over(w).cast("bigint"),
    }
    if spec.form == "range_epoch":
        w = (
            Window.partitionBy("pk")
            .orderBy("epoch_s")
            .rangeBetween(-spec.lo * 86400, 0 if spec.hi == 0 else spec.hi * 86400)
        )
        cols = [agg_col[k](w).alias(alias) for k, alias in spec.aggs]
    elif spec.form == "range_interval":
        upper = (
            "CURRENT ROW" if spec.hi == 0 else f"INTERVAL '{spec.hi}' DAY FOLLOWING"
        )
        over = (
            f"OVER (PARTITION BY pk ORDER BY ots RANGE BETWEEN "
            f"INTERVAL '{spec.lo}' DAY PRECEDING AND {upper})"
        )
        expr_sql = {
            "sum_units": f"CAST(sum(units) {over} AS BIGINT)",
            "count_star": f"CAST(count(*) {over} AS BIGINT)",
            "min_units": f"CAST(min(units) {over} AS BIGINT)",
            "max_units": f"CAST(max(units) {over} AS BIGINT)",
            "count_pk": f"CAST(count(pk) {over} AS BIGINT)",
        }
        cols = [F.expr(expr_sql[k]).alias(alias) for k, alias in spec.aggs]
    else:
        w = (
            Window.partitionBy("pk")
            .orderBy("ots", "o_orderkey")
            .rowsBetween(-spec.lo, spec.hi)
        )
        cols = [agg_col[k](w).alias(alias) for k, alias in spec.aggs]
    return t.select("o_orderkey", "pk", *cols)




# ---- round-10 axis: higher-order ARRAY functions -----------------------------------
#
# The composition family behind scalar_array and the CDC chunker's
# sequence/filter/transform dataflow: lambda-expression chains over arrays
# (transform with NULL injection -> filter -> reductions).  The two engines
# deliberately spell the semantics DIFFERENTLY — Spark uses exists() and
# aggregate() (fold with a typed zero), DuckDB replays with
# len(list_filter(...)) > 0 and coalesce(list_sum(...), 0) — so agreement
# checks the SEMANTICS (empty-array folds, NULL-element propagation,
# lambda arithmetic), not a shared spelling.  NULL elements are filtered
# before reductions on BOTH sides because the engines' reduction NULL
# rules genuinely differ (list_sum skips NULLs, a + fold propagates) —
# that known divergence is the reason the filter stage exists.

HOF_OUTS = ("arr_sum", "arr_len", "arr_max", "has_over")


@dataclass
class HofSpec:
    span: int  # base array length = 1 + o_orderkey % span
    a: int  # transform x -> a*x + b
    b: int
    null_mod: int  # inject NULL where x % null_mod = 0 (0 = no injection)
    filt_mod: int  # keep x % filt_mod != filt_r
    filt_r: int
    thresh: int  # exists threshold
    outs: list[tuple[str, str]]  # (kind, alias)


def gen_hofspec(rng: random.Random) -> HofSpec:
    kinds = rng.sample(HOF_OUTS, rng.randint(2, 4))
    return HofSpec(
        span=rng.choice((3, 5, 8, 13)),
        a=rng.randint(1, 9),
        b=rng.randint(-5, 9),
        null_mod=rng.choice((0, 2, 3, 4)),
        filt_mod=rng.choice((2, 3, 5, 7)),
        filt_r=rng.randint(0, 1),
        thresh=rng.randint(0, 40),
        outs=[(k, f"h{i}") for i, k in enumerate(kinds)],
    )


def _hof_duck_outs(spec: HofSpec) -> dict:
    return {
        "arr_sum": "CAST(coalesce(list_sum(l2), 0) AS BIGINT)",
        "arr_len": "CAST(len(l2) AS BIGINT)",
        "arr_max": "CAST(list_max(l2) AS BIGINT)",
        "has_over": f"CAST(len(list_filter(l2, x -> x > {spec.thresh})) > 0 AS INT)",
    }


def hofspec_to_sql(spec: HofSpec) -> str:
    inner = f"{spec.a} * x + {spec.b}"
    if spec.null_mod:
        body = f"CASE WHEN x % {spec.null_mod} = 0 THEN NULL ELSE {inner} END"
    else:
        body = inner
    duck = _hof_duck_outs(spec)
    parts = [f"{duck[k]} AS {alias}" for k, alias in spec.outs]
    # duck range() is end-EXCLUSIVE; Spark sequence() is inclusive
    return f"""
WITH t AS (
  SELECT o_orderkey,
         list_transform(range(1, 2 + o_orderkey % {spec.span}),
                        x -> {body}) AS l1
  FROM orders
),
f AS (
  SELECT o_orderkey,
         list_filter(l1, x -> x IS NOT NULL
                          AND x % {spec.filt_mod} != {spec.filt_r}) AS l2
  FROM t
)
SELECT o_orderkey, {", ".join(parts)} FROM f
"""


def hofspec_to_spark(spec: HofSpec, orders):
    def xf(x):
        val = (x * spec.a + F.lit(spec.b)).cast("long")
        if spec.null_mod:
            return F.when(x % spec.null_mod == 0, F.lit(None).cast("long")).otherwise(
                val
            )
        return val

    t = orders.select(
        "o_orderkey",
        F.transform(
            F.sequence(F.lit(1), (F.lit(1) + F.col("o_orderkey") % spec.span).cast("int")),
            xf,
        ).alias("l1"),
    )
    f = t.select(
        "o_orderkey",
        F.filter(
            F.col("l1"),
            lambda x: x.isNotNull() & (x % spec.filt_mod != spec.filt_r),
        ).alias("l2"),
    )
    out_col = {
        "arr_sum": F.aggregate(
            F.col("l2"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).cast("bigint"),
        "arr_len": F.size("l2").cast("bigint"),
        "arr_max": F.array_max("l2").cast("bigint"),
        "has_over": F.exists(F.col("l2"), lambda x: x > spec.thresh).cast("int"),
    }
    return f.select(
        "o_orderkey", *[out_col[k].alias(alias) for k, alias in spec.outs]
    )


# ---- merge/changelog axis (round 11) -----------------------------------------------
#
# Seeded random CHANGELOGS lowered to the lakehouse DML surface: a target
# (latest pre-cut state per derived key) and a source changelog (post-cut
# rows, which carry DUPLICATE keys until the spec's dedup rule collapses
# them) flow through operators/table_format.merge_into or changes_between
# on the Spark side, while DuckDB replays the SAME WHEN branches as a
# full-outer-join CASE projection (deliberately different spelling).
# Payloads are made NULLABLE by seeded NULLIF bands so WHEN conditions
# genuinely evaluate to NULL — regression surface for the r10
# NULL-condition-fires-as-delete bug (conditions must coalesce to FALSE).

_MG_CUTS = ["1995-09-01", "1996-06-01", "1997-03-01", "1998-01-01"]
# condition templates: name -> (sql over aliased sides, spark callable)
# condition templates: SQL is written against the joined row's flattened
# names (tp1/tp2 = target payload, sp1/sp2 = source payload)
_MG_DEL = {
    None: None,
    "p2_is_F": ("sp2 = 'F'", lambda t, s: F.col("s.p2") == "F"),
    "src_pricier": ("sp1 > tp1", lambda t, s: F.col("s.p1") > F.col("t.p1")),
    "p1_mod5": ("sp1 % 5 = 0", lambda t, s: F.col("s.p1") % 5 == 0),
}
_MG_UPD = {
    None: None,
    "p1_differs": ("sp1 <> tp1", lambda t, s: F.col("s.p1") != F.col("t.p1")),
    "p2_not_null": ("sp2 IS NOT NULL", lambda t, s: F.col("s.p2").isNotNull()),
    "src_pricier": ("sp1 > tp1", lambda t, s: F.col("s.p1") > F.col("t.p1")),
}
_MG_INS = {
    None: None,
    "p1_even": ("sp1 % 2 = 0", lambda s: F.col("s.p1") % 2 == 0),
    "p2_is_O": ("sp2 = 'O'", lambda s: F.col("s.p2") == "O"),
}
_MG_NMBS = {  # WHEN NOT MATCHED BY SOURCE THEN DELETE (retention clause)
    None: None,
    "t_p1_mod3": ("tp1 % 3 = 0", lambda t: F.col("t.p1") % 3 == 0),
    "t_p2_is_F": ("tp2 = 'F'", lambda t: F.col("t.p2") == "F"),
}


@dataclass
class MgSpec:
    op: str  # 'merge' | 'cdf'
    key_mod: int
    cut: str
    t_null_mod: int | None  # seeded NULL band in the target's p1
    s_null_mod: int | None  # ... and the source's
    null_status: bool  # p2 = NULLIF(status, 'O')
    dedup: str  # 'latest' | 'pricey' — how source dup keys collapse
    del_c: str | None
    upd_c: str | None
    ins_c: str | None
    nmbs_c: str | None = None  # not-matched-by-source DELETE condition
    evolve: bool = False  # round 12: source carries an extra column (p3)
    # that only exists on the source side; merge_into(evolve_schema=True)
    # passes it through as ADD COLUMN — NULL on target-kept rows


def gen_mgspec(rng: random.Random) -> MgSpec:
    return MgSpec(
        op=rng.choice(["merge", "merge", "cdf"]),
        key_mod=rng.choice([50, 100, 250]),
        cut=rng.choice(_MG_CUTS),
        t_null_mod=rng.choice([None, 3, 7]),
        s_null_mod=rng.choice([None, 4, 9]),
        null_status=rng.random() < 0.5,
        dedup=rng.choice(["latest", "pricey"]),
        del_c=rng.choice(list(_MG_DEL)),
        upd_c=rng.choice(list(_MG_UPD)),
        ins_c=rng.choice(list(_MG_INS)),
        nmbs_c=rng.choice(list(_MG_NMBS)),
        evolve=rng.random() < 0.35,
    )


def _mg_side_sql(spec: MgSpec, pre: bool) -> str:
    cmp = "<" if pre else ">="
    null_mod = spec.t_null_mod if pre else spec.s_null_mod
    price = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"
    p1 = (
        f"CASE WHEN o_custkey % {null_mod} = 0 THEN NULL ELSE {price} END"
        if null_mod
        else price
    )
    p2 = "NULLIF(o_orderstatus, 'O')" if spec.null_status else "o_orderstatus"
    order = (
        "o_orderdate DESC, o_orderkey DESC"
        if spec.dedup == "latest"
        else "o_totalprice DESC, o_orderkey DESC"
    )
    p3 = (
        ", o_orderpriority AS p3"
        if (not pre and spec.evolve and spec.op == "merge")
        else ""
    )
    return (
        f"SELECT o_custkey % {spec.key_mod} AS k, {p1} AS p1, {p2} AS p2{p3} "
        f"FROM orders WHERE o_orderdate {cmp} TIMESTAMP '{spec.cut}' "
        f"QUALIFY row_number() OVER (PARTITION BY o_custkey % {spec.key_mod} "
        f"ORDER BY {order}) = 1"
    )


def mgspec_to_sql(spec: MgSpec) -> str:
    del_sql = _MG_DEL[spec.del_c][0] if spec.del_c else "FALSE"
    upd_sql = _MG_UPD[spec.upd_c][0] if spec.upd_c else "TRUE"
    ins_sql = _MG_INS[spec.ins_c][0] if spec.ins_c else "TRUE"
    nmbs_sql = _MG_NMBS[spec.nmbs_c][0] if spec.nmbs_c else "FALSE"
    ev = spec.evolve and spec.op == "merge"
    sp3 = ", s.p3 AS sp3" if ev else ""
    base = f"""
WITH t AS ({_mg_side_sql(spec, pre=True)}),
s AS ({_mg_side_sql(spec, pre=False)}),
j AS (
  SELECT t.k AS tk, s.k AS sk, t.p1 AS tp1, t.p2 AS tp2,
         s.p1 AS sp1, s.p2 AS sp2{sp3}
  FROM t FULL OUTER JOIN s ON t.k = s.k
)"""
    if spec.op == "merge":
        sp3_w = ", sp3" if ev else ""
        p3_proj = (
            """,
       CASE WHEN (matched AND NOT del_c AND upd_c) OR (tk IS NULL AND ins_c)
            THEN sp3 ELSE NULL END AS p3"""
            if ev
            else ""
        )
        # the NULL-condition rule spelled independently: every WHEN
        # condition coalesces to FALSE before composing (evolved column
        # p3: source value where the source wins, NULL on kept rows —
        # merge_into(evolve_schema=True)'s ADD COLUMN rule, spelled
        # independently)
        return f"""{base},
w AS (
  SELECT tk, sk, tp1, tp2, sp1, sp2{sp3_w},
         (tk IS NOT NULL AND sk IS NOT NULL) AS matched,
         coalesce({del_sql}, FALSE) AS del_c,
         coalesce({upd_sql}, FALSE) AS upd_c,
         coalesce({ins_sql}, FALSE) AS ins_c,
         coalesce({nmbs_sql}, FALSE) AS nmbs_c
  FROM j
)
SELECT coalesce(sk, tk) AS k,
       CASE WHEN (matched AND NOT del_c AND upd_c) OR (tk IS NULL AND ins_c)
            THEN sp1 ELSE tp1 END AS p1,
       CASE WHEN (matched AND NOT del_c AND upd_c) OR (tk IS NULL AND ins_c)
            THEN sp2 ELSE tp2 END AS p2{p3_proj}
FROM w
WHERE CASE WHEN matched THEN NOT del_c
           WHEN tk IS NOT NULL THEN NOT nmbs_c
           ELSE ins_c END
"""
    return f"""{base}
SELECT sk AS k, sp1 AS p1, sp2 AS p2, 'insert' AS _change_type
FROM j WHERE tk IS NULL
UNION ALL
SELECT tk, tp1, tp2, 'delete' FROM j WHERE sk IS NULL
UNION ALL
SELECT tk, tp1, tp2, 'update_preimage'
FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL
  AND (tp1 IS DISTINCT FROM sp1 OR tp2 IS DISTINCT FROM sp2)
UNION ALL
SELECT sk, sp1, sp2, 'update_postimage'
FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL
  AND (tp1 IS DISTINCT FROM sp1 OR tp2 IS DISTINCT FROM sp2)
"""


def _mg_side_spark(spec: MgSpec, orders, pre: bool):
    from pyspark.sql import Window

    null_mod = spec.t_null_mod if pre else spec.s_null_mod
    price = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    p1 = (
        F.when(F.col("o_custkey") % null_mod == 0, F.lit(None).cast("long")).otherwise(
            price
        )
        if null_mod
        else price
    )
    p2 = (
        F.expr("nullif(o_orderstatus, 'O')")
        if spec.null_status
        else F.col("o_orderstatus")
    )
    cond = (
        F.col("o_orderdate") < spec.cut if pre else F.col("o_orderdate") >= spec.cut
    )
    order = (
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()]
        if spec.dedup == "latest"
        else [F.col("o_totalprice").desc(), F.col("o_orderkey").desc()]
    )
    w = Window.partitionBy(F.col("o_custkey") % spec.key_mod).orderBy(*order)
    extra = (
        [F.col("o_orderpriority").alias("p3")]
        if (not pre and spec.evolve and spec.op == "merge")
        else []
    )
    return (
        orders.where(cond)
        .select(
            (F.col("o_custkey") % spec.key_mod).alias("k"),
            p1.alias("p1"),
            p2.alias("p2"),
            *extra,
            F.row_number().over(w).alias("_rn"),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def mgspec_to_spark(spec: MgSpec, orders):
    from experiments_datafusion_spark.operators.table_format import (
        changes_between,
        merge_into,
    )

    t = _mg_side_spark(spec, orders, pre=True)
    s = _mg_side_spark(spec, orders, pre=False)
    if spec.op == "merge":
        return merge_into(
            t,
            s,
            key="k",
            payload=["p1", "p2"],
            matched_delete=_MG_DEL[spec.del_c][1] if spec.del_c else None,
            matched_update=_MG_UPD[spec.upd_c][1] if spec.upd_c else None,
            not_matched_insert=_MG_INS[spec.ins_c][1] if spec.ins_c else None,
            not_matched_by_source_delete=(
                _MG_NMBS[spec.nmbs_c][1] if spec.nmbs_c else None
            ),
            evolve_schema=spec.evolve,
        )
    return changes_between(t, s, key="k", payload=["p1", "p2"])


# ---- lowering ---------------------------------------------------------------


def _sql_lit(p: Pred) -> str:
    if p.kind == "num":
        return repr(p.lit)
    if p.kind == "str":
        return "'" + str(p.lit).replace("'", "''") + "'"
    return f"TIMESTAMP '{p.lit}'"


def _sql_pred(p: Pred) -> str:
    if p.kind == "num_between":
        lo, hi = p.lit
        return f"({p.col} BETWEEN {lo!r} AND {hi!r})"
    if p.kind == "str_in":
        vals = ", ".join("'" + str(v).replace("'", "''") + "'" for v in p.lit)
        return f"({p.col} IN ({vals}))"
    return f"({p.col} {p.op} {_sql_lit(p)})"


def to_sql(spec: Spec) -> str:
    conds = f" {spec.conj} ".join(
        _sql_pred(p) for p in spec.preds
    )
    oconds = " AND ".join(_sql_pred(p) for p in spec.join_preds)
    if spec.join == "inner":
        frm = "lineitem JOIN orders ON l_orderkey = o_orderkey"
        conds = f"({conds}) AND ({oconds})"
    elif spec.join == "left":
        frm = f"lineitem LEFT JOIN orders ON l_orderkey = o_orderkey AND ({oconds})"
    elif spec.join == "semi":
        frm = "lineitem"
        conds = (
            f"({conds}) AND l_orderkey IN "
            f"(SELECT o_orderkey FROM orders WHERE {oconds})"
        )
    else:
        frm = spec.table
    parts = []
    for a in spec.aggs:
        filt = f" FILTER (WHERE {_sql_pred(a.filt)})" if a.filt is not None else ""
        if a.kind == "count_star":
            parts.append(f"CAST(count(*){filt} AS BIGINT) AS {a.alias}")
        elif a.kind == "count":
            parts.append(f"CAST(count({a.col}){filt} AS BIGINT) AS {a.alias}")
        elif a.kind == "count_distinct":
            parts.append(f"CAST(count(DISTINCT {a.col}){filt} AS BIGINT) AS {a.alias}")
        elif a.kind == "sum_units":
            parts.append(
                f"CAST(sum(CAST(round(({a.col}) * 100, 0) AS BIGINT)){filt} AS BIGINT) AS {a.alias}"
            )
        else:  # min / max — selections
            parts.append(f"{a.kind}({a.col}){filt} AS {a.alias}")
    sel = (", ".join(spec.groupby) + ", " if spec.groupby else "") + ", ".join(parts)
    sql = f"SELECT {sel} FROM {frm} WHERE {conds}"
    if spec.groupby:
        keys = ", ".join(spec.groupby)
        if spec.grouping == "rollup":
            sql += f" GROUP BY ROLLUP({keys})"
        elif spec.grouping == "cube":
            sql += f" GROUP BY CUBE({keys})"
        else:
            sql += f" GROUP BY {keys}"
    if spec.having_min_n is not None:
        sql += f" HAVING count(*) >= {spec.having_min_n}"
    if spec.order_limit is not None:
        sql += (
            " ORDER BY count(*) DESC, "
            + ", ".join(spec.groupby)
            + f" LIMIT {spec.order_limit}"
        )
    return sql


def _spark_cond(preds: list[Pred], conj: str):
    cond = None
    for p in preds:
        c = F.col(p.col)
        if p.kind == "num_between":
            lo, hi = p.lit
            e = c.between(F.lit(lo), F.lit(hi))
            cond = e if cond is None else (cond & e if conj == "AND" else cond | e)
            continue
        if p.kind == "str_in":
            e = c.isin(*p.lit)
            cond = e if cond is None else (cond & e if conj == "AND" else cond | e)
            continue
        lit = F.lit(p.lit).cast("timestamp") if p.kind == "date" else F.lit(p.lit)
        e = {
            "<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit,
            "=": c == lit, "<>": c != lit,
        }[p.op]
        cond = e if cond is None else (cond & e if conj == "AND" else cond | e)
    return cond


def to_spark(spec: Spec, df, orders=None):
    out = df.where(_spark_cond(spec.preds, spec.conj))
    if spec.join is not None:
        # filtering the right side BEFORE the join == ON-clause extra preds
        right = orders.where(_spark_cond(spec.join_preds, "AND"))
        how = {"inner": "inner", "left": "left", "semi": "left_semi"}[spec.join]
        out = out.join(right, out["l_orderkey"] == right["o_orderkey"], how)
    aggs = []
    for a in spec.aggs:
        # FILTER (WHERE f) lowers to agg(when(f, x)): the non-matching rows
        # become NULL, which every aggregate here ignores
        fc = _spark_cond([a.filt], "AND") if a.filt is not None else None
        wrap = (lambda e: F.when(fc, e)) if fc is not None else (lambda e: e)
        if a.kind == "count_star":
            aggs.append(F.count(wrap(F.lit(1))).alias(a.alias))
        elif a.kind == "count":
            aggs.append(F.count(wrap(F.col(a.col))).alias(a.alias))
        elif a.kind == "count_distinct":
            aggs.append(F.countDistinct(wrap(F.col(a.col))).alias(a.alias))
        elif a.kind == "sum_units":
            aggs.append(
                F.sum(wrap(F.round(F.col(a.col) * 100, 0).cast("long")))
                .cast("bigint").alias(a.alias)
            )
        elif a.kind == "min":
            aggs.append(F.min(wrap(F.col(a.col))).alias(a.alias))
        else:
            aggs.append(F.max(wrap(F.col(a.col))).alias(a.alias))
    if spec.grouping == "rollup":
        grouped = out.rollup(*spec.groupby)
    elif spec.grouping == "cube":
        grouped = out.cube(*spec.groupby)
    else:
        grouped = out.groupBy(*spec.groupby) if spec.groupby else out.groupBy()
    res = grouped.agg(*aggs)
    if spec.having_min_n is not None:
        res = res.where(F.col("n") >= spec.having_min_n)
    if spec.order_limit is not None:
        res = res.orderBy(F.desc("n"), *spec.groupby).limit(spec.order_limit)
    return res


# ---- harness ----------------------------------------------------------------


def norm(df) -> list[str]:
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(f"{round(v, 6)}")
            elif hasattr(v, "strftime"):
                vals.append(v.strftime("%Y-%m-%d %H:%M:%S"))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def _pick_family(r: float) -> str:
    if r < 0.12:
        return "window"
    if r < 0.23:
        return "setop"
    if r < 0.33:
        return "scalar"
    if r < 0.45:
        return "outerjoin"
    if r < 0.54:
        return "groupingsets"
    if r < 0.63:
        return "correlated"
    if r < 0.71:
        return "nullset"
    if r < 0.80:
        return "decimal"
    if r < 0.86:
        return "datetime"
    if r < 0.91:
        return "frame"
    if r < 0.95:
        return "hof"
    if r < 0.98:
        return "merge"
    return "agg"


def run(
    n_specs: int, seed: int, sf_dir: str, spark=None, con=None, only=None
) -> list[tuple]:
    """Returns [(spec_idx, sql, ok, detail)] for every generated spec.
    ``only``: optional tuple of family names to restrict generation to
    (the per-axis seeded pytest runs)."""
    import duckdb

    from experiments_datafusion_spark.io import table as load_table

    own_spark = spark is None
    if own_spark:
        from experiments_datafusion_spark.session import get_spark

        spark = get_spark("fuzz-differential")
    if con is None:
        con = duckdb.connect()
        for t in ("lineitem", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    rng = random.Random(seed)
    dfs = {t: load_table(spark, sf_dir, t) for t in ("lineitem", "orders")}
    results = []
    for i in range(n_specs):
        grouping = None  # set by the agg-spec branch; gates the rollup/cube
        fam = rng.choice(only) if only else _pick_family(rng.random())
        if fam == "window":
            wspec = gen_wspec(rng)
            sql = wspec_to_sql(wspec)
            builder = lambda: wspec_to_spark(wspec, dfs["lineitem"])  # noqa: B023,E731
        elif fam == "setop":
            sspec = gen_setspec(rng)
            sql = setspec_to_sql(sspec)
            builder = lambda: setspec_to_spark(sspec, dfs["lineitem"])  # noqa: B023,E731
        elif fam == "scalar":
            cspec = gen_sspec(rng)
            sql = sspec_to_sql(cspec)
            builder = lambda: sspec_to_spark(cspec, dfs["lineitem"])  # noqa: B023,E731
        elif fam == "outerjoin":
            ojspec = gen_ojspec(rng)
            sql = ojspec_to_sql(ojspec)
            builder = lambda: ojspec_to_spark(ojspec, dfs["lineitem"], dfs["orders"])  # noqa: B023,E731
        elif fam == "groupingsets":
            gspec = gen_gsspec(rng)
            sql = gsspec_to_sql(gspec)
            builder = lambda: gsspec_to_spark(gspec, dfs[gspec.table])  # noqa: B023,E731
            # the () grand-total set hits the same empty-input divergence
            # as ROLLUP/CUBE (see the known-divergence branch below)
            grouping = "sets" if () in gspec.sets else None
        elif fam == "correlated":
            crspec = gen_corrspec(rng)
            sql = corrspec_to_sql(crspec)
            builder = lambda: corrspec_to_spark(crspec, dfs["lineitem"], dfs["orders"])  # noqa: B023,E731
        elif fam == "nullset":
            nsspec = gen_nullsetspec(rng)
            sql = nullsetspec_to_sql(nsspec)
            builder = lambda: nullsetspec_to_spark(nsspec, dfs["lineitem"])  # noqa: B023,E731
        elif fam == "decimal":
            dspec = gen_decspec(rng)
            sql = decspec_to_sql(dspec)
            builder = lambda: decspec_to_spark(dspec, dfs["lineitem"])  # noqa: B023,E731
        elif fam == "datetime":
            dtspec = gen_dtspec(rng)
            sql = dtspec_to_sql(dtspec)
            builder = lambda: dtspec_to_spark(dtspec, dfs["lineitem"])  # noqa: B023,E731
        elif fam == "frame":
            fspec = gen_framespec(rng)
            sql = framespec_to_sql(fspec)
            builder = lambda: framespec_to_spark(fspec, dfs["orders"])  # noqa: B023,E731
        elif fam == "hof":
            hspec = gen_hofspec(rng)
            sql = hofspec_to_sql(hspec)
            builder = lambda: hofspec_to_spark(hspec, dfs["orders"])  # noqa: B023,E731
        elif fam == "merge":
            mgspec = gen_mgspec(rng)
            sql = mgspec_to_sql(mgspec)
            builder = lambda: mgspec_to_spark(mgspec, dfs["orders"])  # noqa: B023,E731
        else:
            spec = gen_spec(rng)
            sql = to_sql(spec)
            builder = lambda: to_spark(spec, dfs[spec.table], orders=dfs["orders"])  # noqa: B023,E731
            grouping = spec.grouping
        try:
            got = norm(builder().toPandas())
            want = norm(con.execute(sql).df())
            ok = got == want
            detail = "" if ok else f"spark {len(got)} rows vs duck {len(want)}"
            if not ok and grouping and len(got) == 0 and len(want) == 1:
                # DOCUMENTED ENGINE DIVERGENCE (found by this fuzzer, seed
                # 987654): on EMPTY input, the SQL standard's empty grouping
                # set () inside ROLLUP/CUBE aggregates globally and emits one
                # grand-total row (count 0, NULL keys) — DuckDB and Postgres
                # do; Spark returns no rows at all (both DataFrame rollup/
                # cube and SQL GROUP BY ROLLUP — verified on Spark 4.1).
                # Accept the single all-NULL zero-count oracle row as the
                # known deviation; tests/test_fuzz_differential.py pins the
                # behavior so a future Spark fix retires this branch.
                ok = True
                detail = "known-divergence: empty-input ROLLUP/CUBE grand-total row"
            elif not ok:
                pairs = [(g, w) for g, w in zip(got, want) if g != w][:2]
                detail += f" first diffs: {pairs}"
        except Exception as exc:  # lowering bug — count as failure
            ok, detail = False, f"exception: {exc}"
        results.append((i, sql, ok, detail))
    if own_spark:
        spark.stop()
    return results


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    results = run(n, seed, sf_dir)
    fails = [r for r in results if not r[2]]
    for i, sql, ok, detail in results:
        mark = "ok  " if ok else "FAIL"
        print(f"{mark} spec {i}: {sql[:110]}{' -- ' + detail if detail else ''}")
    print(f"RESULT: {len(results) - len(fails)} pass, {len(fails)} fail (seed={seed})")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
