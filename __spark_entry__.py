"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``   — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()``— matching DuckDB SQL per query.

Numeric determinism note: aggregate queries cast operands to DECIMAL
before SUM in BOTH the Spark query and the DuckDB oracle. Decimal sums
are exact and order-independent, so both engines produce bit-identical
doubles after the final cast — double sums would differ in the last
ulps depending on partition/evaluation order and break the value-hash
compare. COUNT-only queries go through our parser + exact-plane
compiler (plans/parser.py, plans/compiler.py) since integer results
are exact either way.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from deepdb_public_spark.engine import Engine

_ENGINES: dict[tuple[int, str], Engine] = {}


def _engine(spark: SparkSession, sf_dir: str) -> Engine:
    key = (id(spark), sf_dir)
    if key not in _ENGINES:
        _ENGINES[key] = Engine(spark, sf_dir)
    return _ENGINES[key]


# --- queries routed through our parser + Query IR + exact compiler ---
# (reference grammar, SURVEY.md §2 table A; COUNT-only => exact ints)
_IR_QUERIES: dict[str, str] = {
    # A5/A9/A15: BETWEEN + COUNT(*) cardinality
    "q01_count_between": (
        "SELECT COUNT(*) AS cnt FROM lineitem "
        "WHERE lineitem.l_discount BETWEEN 0.02 AND 0.06"
    ),
    # A2 chain + A3 equality: 3-way FK join
    "q02_join3_count": (
        "SELECT COUNT(*) AS cnt FROM customer, orders, lineitem "
        "WHERE customer.c_custkey = orders.o_custkey "
        "AND orders.o_orderkey = lineitem.l_orderkey "
        "AND customer.c_mktsegment = 'BUILDING'"
    ),
    # A3 <>: inequality predicate
    "q09_neq": (
        "SELECT COUNT(*) AS cnt FROM orders WHERE orders.o_orderstatus <> 'F'"
    ),
    # A4 + A6 + A15: 4-way join, range + IN predicates
    "q18_join4_card": (
        "SELECT COUNT(*) AS cnt FROM part, lineitem, orders, customer "
        "WHERE lineitem.l_partkey = part.p_partkey "
        "AND lineitem.l_orderkey = orders.o_orderkey "
        "AND orders.o_custkey = customer.c_custkey "
        "AND part.p_size < 20 "
        "AND customer.c_mktsegment IN ('BUILDING', 'MACHINERY') "
        "AND lineitem.l_quantity >= 10"
    ),
}

# --- queries run as SQL on the exact plane (engine.sql == spark.sql);
# text is engine-portable ANSI so the oracle strings are identical ---
_SQL_QUERIES: dict[str, str] = {
    # A12/A14 flagship: grouped COUNT/SUM(a*b)/AVG with join + ranges
    "q03_flagship": """
        SELECT l_returnflag,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
          AND l_discount BETWEEN 0.01 AND 0.06
        GROUP BY l_returnflag
    """,
    # A6/A10: IN predicate + SUM over 2-way join
    "q04_in_pred": """
        SELECT COUNT(*) AS cnt,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand IN ('Brand#1', 'Brand#2') AND p_size < 20
    """,
    # A13: arithmetic between aggregates
    "q05_agg_arith": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               - CAST(SUM(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE) AS price_minus_tax
        FROM lineitem WHERE l_quantity < 25
    """,
    # A4/A10/A14: 5-way snowflake join grouped SUM
    "q06_snowflake": """
        SELECT n_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    # anti-join semantics (orders with no lineitems; FIXTURES.md quirk)
    "q07_no_lineitems": """
        SELECT COUNT(*) AS cnt FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    """,
    # C4 validation: FK fanout ("multiplier") distribution — checks the
    # same math the training-sample generator materializes
    "q08_fanout_hist": """
        SELECT fanout, COUNT(*) AS n_orders FROM (
            SELECT o_orderkey, COUNT(l_orderkey) AS fanout
            FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderkey
        ) t GROUP BY fanout
    """,
    # A14 two group-by columns
    "q10_groupby2": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    # beyond reference (SURVEY §2 E): DISTINCT aggregate
    "q11_count_distinct": """
        SELECT COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps
        FROM lineitem WHERE l_discount > 0.05
    """,
    # beyond reference: ORDER BY + LIMIT top-k
    "q12_topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    # beyond reference: window function (rank per partition)
    "q13_window_rank": """
        SELECT c_custkey, rnk FROM (
            SELECT c_custkey,
                   RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk
            FROM customer
        ) t WHERE rnk <= 3
    """,
    # beyond reference: HAVING
    "q14_having": """
        SELECT l_orderkey, COUNT(*) AS n FROM lineitem
        GROUP BY l_orderkey HAVING COUNT(*) >= 6
    """,
    # beyond reference: set op (UNION dedups)
    "q15_union": """
        SELECT c_nationkey AS nk FROM customer
        UNION
        SELECT s_nationkey AS nk FROM supplier
    """,
    # beyond reference: ROLLUP grouping sets
    "q16_rollup": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    # A7: IS NULL via full outer join NULL-augmentation (C5 semantics)
    "q17_outer_null": """
        SELECT COUNT(*) AS cnt
        FROM orders FULL OUTER JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_orderkey IS NULL
    """,
}


def _ir_runner(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _engine(spark, sf_dir).query(sql)

    return run


def _sql_runner(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _engine(spark, sf_dir).sql(sql)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1) on sf0.001."""
    return _sql_runner(_SQL_QUERIES["q03_flagship"])(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, sql in _IR_QUERIES.items():
        out[name] = _ir_runner(sql)
    for name, sql in _SQL_QUERIES.items():
        out[name] = _sql_runner(sql)
    return out


def oracle_sql() -> dict[str, str]:
    out = dict(_SQL_QUERIES)
    # IR-path queries: the engine-grammar text is already ANSI SQL that
    # DuckDB runs directly (aliases resolve the same way).
    out.update(_IR_QUERIES)
    return out
