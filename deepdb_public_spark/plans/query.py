"""Query IR — the internal representation both planes compile from.

Re-expresses the reference's query IR (reference:
ensemble_compilation/graph_representation.py::Query, ::QueryType,
::AggregationType, ::AggregationOperationType — SURVEY.md §1.1/table A).

One IR, two compilers:
- exact plane: plans/compiler.py -> Spark DataFrame (Catalyst optimizes)
- model plane: spn/ensemble.py   -> expectation-factor list (numpy)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class QueryType(Enum):
    CARDINALITY = 0
    AQP = 1


class AggregationType(Enum):
    SUM = 0
    AVG = 1
    COUNT = 2


class AggregationOperationType(Enum):
    AGGREGATION = 0
    PLUS = 1
    MINUS = 2


@dataclass
class Condition:
    """One conjunct: ``table.column op literal``.

    op in {=, <>, <, <=, >, >=, BETWEEN, IN, IS_NULL, IS_NOT_NULL}.
    For BETWEEN, value is (lo, hi); for IN, a list; for IS_[NOT_]NULL,
    None. (reference: condition strings attached per table in Query,
    parsed later by aqp_spn/aqp_spn.py::_parse_conditions.)
    """

    table: str
    column: str
    op: str
    value: object = None

    def __str__(self) -> str:
        if self.op == "OR":
            return "(" + " OR ".join(str(c) for c in self.value) + ")"
        if self.op in ("BETWEEN", "NOT_BETWEEN"):
            kw = "NOT BETWEEN" if self.op == "NOT_BETWEEN" else "BETWEEN"
            return f"{self.table}.{self.column} {kw} {self.value[0]} AND {self.value[1]}"
        if self.op in ("IN", "NOT_IN"):
            kw = "NOT IN" if self.op == "NOT_IN" else "IN"
            vals = ", ".join(repr(v) for v in self.value)
            return f"{self.table}.{self.column} {kw} ({vals})"
        if self.op in ("LIKE", "NOT_LIKE"):
            kw = "NOT LIKE" if self.op == "NOT_LIKE" else "LIKE"
            return f"{self.table}.{self.column} {kw} {self.value!r}"
        if self.op == "IS_NULL":
            return f"{self.table}.{self.column} IS NULL"
        if self.op == "IS_NOT_NULL":
            return f"{self.table}.{self.column} IS NOT NULL"
        return f"{self.table}.{self.column} {self.op} {self.value!r}"


@dataclass
class AggOperation:
    """One step of the aggregate expression sequence (reference:
    Query.add_aggregation_operation with AggregationOperationType):
    AGGREGATION steps contribute SUM/AVG/COUNT over a product of
    columns; PLUS/MINUS combine with the previous accumulated value
    (reference A13: ``SUM(x) - SUM(y)``)."""

    op_type: AggregationOperationType
    agg_type: AggregationType | None = None
    # operands: list of (table, column); len>1 means a product of
    # columns inside the aggregate (reference A12: SUM(a*b)).
    operands: list[tuple[str, str]] = field(default_factory=list)
    alias: str | None = None
    # COUNT(DISTINCT t.c) — grammar extension: exact plane compiles
    # countDistinct, model plane answers via the B9 combination grid
    # (SPNModel.distinct_count)
    distinct: bool = False


@dataclass
class Query:
    """(reference: graph_representation.py::Query)."""

    query_type: QueryType = QueryType.CARDINALITY
    table_set: set[str] = field(default_factory=set)
    relationship_set: set[str] = field(default_factory=set)
    conditions: list[Condition] = field(default_factory=list)
    group_bys: list[tuple[str, str]] = field(default_factory=list)
    aggregations: list[AggOperation] = field(default_factory=list)
    # HAVING extension (reference grammar has none): conjunctive
    # post-aggregation predicates referencing output ALIASES —
    # [(alias, op, literal), ...] with op in {=,<>,<,<=,>,>=}. The
    # exact plane filters after the aggregate; the model plane
    # filters its estimated rows (approximate group membership).
    having: list[tuple[str, str, object]] = field(default_factory=list)

    def add_join_condition(self, relationship_identifier: str) -> None:
        self.relationship_set.add(relationship_identifier)

    def add_where_condition(self, cond: Condition) -> None:
        self.conditions.append(cond)

    def add_group_by(self, table: str, column: str) -> None:
        self.group_bys.append((table, column))

    def conditions_for(self, table: str) -> list[Condition]:
        return [c for c in self.conditions if c.table == table]
