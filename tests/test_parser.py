"""Parser unit tests (reference grammar, SURVEY.md §2 table A):
accepted shapes incl. JOB-light-style aliases, and loud rejection of
everything outside the fragment."""

from __future__ import annotations

import pytest

from deepdb_public_spark.plans.parser import parse_query
from deepdb_public_spark.plans.query import (
    AggregationOperationType,
    AggregationType,
    QueryType,
)
from deepdb_public_spark.plans.schema import tpch_like_schema

S = tpch_like_schema()


def test_aliases_job_light_style():
    q = parse_query(
        "SELECT COUNT(*) FROM orders o, lineitem l "
        "WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'",
        S,
    )
    assert q.table_set == {"orders", "lineitem"}
    assert q.relationship_set == {"lineitem.l_orderkey = orders.o_orderkey"}
    assert q.query_type is QueryType.CARDINALITY
    [c] = q.conditions
    assert (c.table, c.column, c.op, c.value) == ("orders", "o_orderstatus", "=", "F")


def test_agg_arithmetic_and_products():
    q = parse_query(
        "SELECT SUM(lineitem.l_extendedprice * lineitem.l_discount) - SUM(lineitem.l_tax) AS d "
        "FROM lineitem",
        S,
    )
    assert q.query_type is QueryType.AQP
    assert [a.op_type for a in q.aggregations] == [
        AggregationOperationType.AGGREGATION,
        AggregationOperationType.MINUS,
    ]
    assert q.aggregations[0].operands == [
        ("lineitem", "l_extendedprice"),
        ("lineitem", "l_discount"),
    ]
    assert q.aggregations[1].alias == "d"


def test_group_by_and_literals():
    q = parse_query(
        "SELECT lineitem.l_returnflag, AVG(lineitem.l_quantity) AS aq FROM lineitem "
        "WHERE lineitem.l_shipdate >= DATE '1997-01-01' "
        "AND lineitem.l_discount BETWEEN 0.01 AND 0.05 "
        "AND lineitem.l_returnflag IN ('A', 'N') "
        "GROUP BY lineitem.l_returnflag",
        S,
    )
    assert q.group_bys == [("lineitem", "l_returnflag")]
    ops = {c.op: c for c in q.conditions}
    assert ops[">="].value == "1997-01-01"
    assert ops["BETWEEN"].value == (0.01, 0.05)
    assert ops["IN"].value == ["A", "N"]
    assert q.aggregations[0].agg_type is AggregationType.AVG


def test_null_and_neq():
    q = parse_query(
        "SELECT COUNT(*) FROM orders WHERE orders.o_orderstatus != 'F' "
        "AND orders.o_totalprice IS NOT NULL",
        S,
    )
    assert {c.op for c in q.conditions} == {"<>", "IS_NOT_NULL"}


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT COUNT(*) FROM lineitem WHERE lineitem.l_tax = 0 OR lineitem.l_discount = 0",
        "SELECT COUNT(*) FROM lineitem, region",  # disconnected
        "SELECT COUNT(*) FROM nosuch",
        "SELECT MAX(lineitem.l_tax) FROM lineitem",  # MAX outside grammar
        "DELETE FROM lineitem",
        "SELECT COUNT(*) FROM customer, lineitem WHERE customer.c_custkey = lineitem.l_orderkey",  # not a declared FK
    ],
)
def test_rejections(bad):
    with pytest.raises(ValueError):
        parse_query(bad, S)


def test_keywords_inside_string_literals_are_data():
    """AND/OR/NOT/BETWEEN/commas inside quoted values must not be
    treated as grammar (masking fix)."""
    g = tpch_like_schema()
    q = parse_query(
        "SELECT COUNT(*) FROM orders WHERE orders.o_orderpriority IN "
        "('5-LOW', '4-NOT SPECIFIED') AND orders.o_orderstatus = 'O'",
        g,
    )
    ops = {(c.op, tuple(c.value) if isinstance(c.value, list) else c.value) for c in q.conditions}
    assert ("IN", ("5-LOW", "4-NOT SPECIFIED")) in ops
    q2 = parse_query(
        "SELECT COUNT(*) FROM customer WHERE customer.c_name = 'ROCK AND ROLL OR NOT'",
        g,
    )
    assert q2.conditions[0].value == "ROCK AND ROLL OR NOT"
    q3 = parse_query(
        "SELECT COUNT(*) FROM customer WHERE customer.c_name IN ('A, B', 'C')", g
    )
    assert q3.conditions[0].value == ["A, B", "C"]
    with pytest.raises(ValueError):
        parse_query(
            "SELECT COUNT(*) FROM customer WHERE customer.c_acctbal > 5 OR customer.c_acctbal < 0",
            g,
        )


class TestParserReviewFixes:
    """Round-3 review regressions: literal-preserving preprocessing,
    masked-text clause matching, loud out-of-grammar rejections."""

    def test_literal_whitespace_preserved(self):
        q = parse_query(
            "SELECT COUNT(*) AS c FROM part WHERE part.p_type = 'a  b'", S
        )
        assert q.conditions_for("part")[0].value == "a  b"

    def test_keyword_inside_literal_not_a_clause(self):
        q = parse_query(
            "SELECT COUNT(*) AS c FROM part "
            "WHERE part.p_type = 'x GROUP BY y'",
            S,
        )
        assert q.conditions_for("part")[0].value == "x GROUP BY y"
        assert not q.group_bys

    def test_between_with_and_inside_literal(self):
        q = parse_query(
            "SELECT COUNT(*) AS c FROM part "
            "WHERE part.p_type BETWEEN 'x' AND 'A AND B'",
            S,
        )
        cond = q.conditions_for("part")[0]
        assert cond.op == "BETWEEN" and cond.value == ("x", "A AND B")

    def test_multiline_query_parses(self):
        q = parse_query(
            "SELECT COUNT(*) AS c\nFROM part\nWHERE part.p_size\n< 20", S
        )
        assert q.conditions_for("part")[0].op == "<"

    def test_unknown_join_alias_is_loud(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unknown table or alias"):
            parse_query(
                "SELECT COUNT(*) FROM orders o, lineitem l "
                "WHERE l.l_orderkey = ord.o_orderkey",
                S,
            )

    def test_numeric_literal_predicate_still_parses(self):
        q = parse_query(
            "SELECT COUNT(*) AS c FROM lineitem WHERE lineitem.l_tax = 0.07",
            S,
        )
        assert q.conditions_for("lineitem")[0].value == 0.07

    def test_bare_projection_rejected(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="GROUP BY"):
            parse_query("SELECT part.p_type FROM part", S)
        # but group-by echo stays legal
        q = parse_query(
            "SELECT part.p_type, COUNT(*) AS c FROM part GROUP BY part.p_type",
            S,
        )
        assert q.group_bys == [("part", "p_type")]


class TestCompilerCycleEdges:
    def test_cycle_closing_edge_is_applied(self, spark):
        """5 tables + 5 FK edges = one cycle through nation; the
        cycle-closing equality must filter the result, matching SQL."""
        from deepdb_public_spark.engine import Engine
        from tests.conftest import SF_SMOKE

        eng = Engine(spark, SF_SMOKE)
        sql = (
            "SELECT COUNT(*) AS c FROM lineitem, orders, customer, supplier, nation "
            "WHERE lineitem.l_orderkey = orders.o_orderkey "
            "AND orders.o_custkey = customer.c_custkey "
            "AND customer.c_nationkey = nation.n_nationkey "
            "AND lineitem.l_suppkey = supplier.s_suppkey "
            "AND supplier.s_nationkey = nation.n_nationkey"
        )
        got = eng.query(sql).collect()[0][0]
        want = eng.sql(
            """
            SELECT COUNT(*) FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
            """
        ).collect()[0][0]
        assert got == want


class TestRound7ParserHardening:
    @pytest.fixture
    def schema(self):
        return S

    def test_and_adjacent_to_paren(self, schema):
        q = parse_query(
            "SELECT COUNT(*) FROM orders WHERE orders.o_shippriority = 1 "
            "AND(orders.o_custkey = 2)",
            schema,
        )
        ops = {(c.column, c.op) for c in q.conditions}
        assert ("o_shippriority", "=") in ops
        assert ("o_custkey", "=") in ops
        vals = {c.column: c.value for c in q.conditions}
        assert vals["o_shippriority"] == 1  # not '1 AND(...)' as string

    def test_trailing_limit_rejected(self, schema):
        import pytest as _pt

        with _pt.raises(ValueError, match="LIMIT"):
            parse_query(
                "SELECT COUNT(*) FROM orders WHERE orders.o_shippriority = 1 "
                "LIMIT 10",
                schema,
            )
        with _pt.raises(ValueError, match="ORDER"):
            parse_query(
                "SELECT COUNT(*) FROM orders WHERE orders.o_shippriority = 1 "
                "ORDER BY orders.o_custkey",
                schema,
            )

    def test_nested_conjunction_after_between_rejected(self, schema):
        import pytest as _pt

        with _pt.raises(ValueError, match="conjunctions inside"):
            parse_query(
                "SELECT COUNT(*) FROM orders WHERE "
                "(orders.o_custkey BETWEEN 1 AND 5 AND "
                "orders.o_shippriority = 2 OR orders.o_custkey = 9)",
                schema,
            )

    def test_double_quoted_in_list_masks(self, schema):
        q = parse_query(
            'SELECT COUNT(*) FROM orders WHERE '
            'orders.o_orderpriority IN ("a,b", "c")',
            schema,
        )
        (c,) = q.conditions
        assert c.op == "IN"
        assert set(c.value) == {"a,b", "c"}

    def test_unqualified_operand_multi_table_rejected(self, schema):
        import pytest as _pt

        with _pt.raises(ValueError, match="unqualified"):
            parse_query(
                "SELECT SUM(o_totalprice) FROM lineitem, orders WHERE "
                "lineitem.l_orderkey = orders.o_orderkey",
                schema,
            )
        # single-table queries keep the convenience default
        q = parse_query("SELECT SUM(o_totalprice) FROM orders", schema)
        assert q.aggregations[0].operands == [("orders", "o_totalprice")]
