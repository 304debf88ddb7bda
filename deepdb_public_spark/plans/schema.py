"""Schema graph: tables + declared FK relationships.

Spark-first re-expression of the reference's logical schema layer
(reference: ensemble_compilation/graph_representation.py::Table,
::Relationship, ::SchemaGraph — see SURVEY.md §1.1; the reference
checkout was empty this round, citations are path::symbol).

Tables are parquet-backed Spark DataFrames registered as temp views;
the graph carries only metadata (PKs, FK edges) that Spark's catalog
does not model. Every query the engine accepts must stay inside this
join graph, exactly as in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Table:
    """A named relation (reference: graph_representation.py::Table).

    ``table_size`` is advisory metadata used for broadcast decisions and
    for model-plane sample-rate bookkeeping (reference C7); it is not
    required to be exact.
    """

    table_name: str
    primary_key: list[str] = field(default_factory=list)
    attributes: list[str] | None = None
    irrelevant_attributes: list[str] = field(default_factory=list)
    table_size: int | None = None
    sample_rate: float = 1.0

    @property
    def is_dimension(self) -> bool:
        """Heuristic used by the exact-plane compiler to add broadcast
        hints: small declared size => broadcast side of a join."""
        return self.table_size is not None and self.table_size <= 1_000_000


@dataclass(frozen=True)
class Relationship:
    """Directed FK edge start.start_attr -> end.end_attr
    (reference: graph_representation.py::Relationship).

    ``identifier`` matches the reference's string form
    ``"start.attr = end.attr"`` so parsed join conditions can be looked
    up verbatim. ``multiplier_attribute_name`` / ``null_indicator_name``
    name the derived fanout columns materialized by the training-sample
    generator (reference C4/C5, join_data_preparation.py).
    """

    start: str
    start_attr: str
    end: str
    end_attr: str

    @property
    def identifier(self) -> str:
        return f"{self.start}.{self.start_attr} = {self.end}.{self.end_attr}"

    @property
    def multiplier_attribute_name(self) -> str:
        return f"mul_{self.start}_{self.start_attr}"

    @property
    def null_indicator_name(self) -> str:
        return f"nn_{self.start}_{self.start_attr}"


class SchemaGraph:
    """Tables + FK relationships (reference:
    graph_representation.py::SchemaGraph.add_table/add_relationship)."""

    def __init__(self) -> None:
        self.tables: dict[str, Table] = {}
        self.relationships: dict[str, Relationship] = {}

    def add_table(self, table: Table) -> None:
        self.tables[table.table_name] = table

    def add_relationship(
        self, start: str, start_attr: str, end: str, end_attr: str
    ) -> Relationship:
        rel = Relationship(start, start_attr, end, end_attr)
        self.relationships[rel.identifier] = rel
        return rel

    def find_relationship(self, t1: str, a1: str, t2: str, a2: str) -> Relationship | None:
        """Match a parsed equi-join condition against a declared edge,
        in either direction."""
        for s, sa, e, ea in ((t1, a1, t2, a2), (t2, a2, t1, a1)):
            rel = self.relationships.get(f"{s}.{sa} = {e}.{ea}")
            if rel is not None:
                return rel
        return None

    def neighbors(self, table: str) -> list[tuple[Relationship, str]]:
        out = []
        for rel in self.relationships.values():
            if rel.start == table:
                out.append((rel, rel.end))
            elif rel.end == table:
                out.append((rel, rel.start))
        return out


def tpch_like_schema() -> SchemaGraph:
    """Schema graph for the driver's fixture tables (FIXTURES.md).

    Mirrors the reference's per-dataset builders
    (reference: schemas/<dataset>/schema.py::gen_*_schema).
    Row counts are sf0.01 advisory sizes for broadcast decisions.
    """
    g = SchemaGraph()
    g.add_table(Table("region", ["r_regionkey"], table_size=5))
    g.add_table(Table("nation", ["n_nationkey"], table_size=25))
    g.add_table(Table("customer", ["c_custkey"], table_size=1_500))
    g.add_table(Table("supplier", ["s_suppkey"], table_size=100))
    g.add_table(Table("part", ["p_partkey"], table_size=2_000))
    # fact tables: size scales with sf and is unbounded at 100 TB —
    # leave table_size unset so the compiler never broadcasts them
    g.add_table(Table("orders", ["o_orderkey"]))
    g.add_table(Table("lineitem", ["l_orderkey", "l_linenumber"]))
    g.add_table(
        # props is a free-form JSON payload: declared irrelevant for
        # modeling (reference C1 irrelevant_attributes), still fully
        # queryable on the exact plane (x16_json_extract)
        Table("events", ["event_id"], irrelevant_attributes=["props"])
    )
    g.add_table(Table("documents", ["doc_id"], table_size=500))
    g.add_table(Table("embeddings", ["vec_id"], table_size=500))

    g.add_relationship("lineitem", "l_orderkey", "orders", "o_orderkey")
    g.add_relationship("lineitem", "l_partkey", "part", "p_partkey")
    g.add_relationship("lineitem", "l_suppkey", "supplier", "s_suppkey")
    g.add_relationship("orders", "o_custkey", "customer", "c_custkey")
    g.add_relationship("customer", "c_nationkey", "nation", "n_nationkey")
    g.add_relationship("supplier", "s_nationkey", "nation", "n_nationkey")
    g.add_relationship("nation", "n_regionkey", "region", "r_regionkey")
    g.add_relationship("events", "user_id", "customer", "c_custkey")
    return g


def schema_to_json(g: SchemaGraph) -> dict:
    """Serializable form of a SchemaGraph — the rebuild's analogue of
    the reference's per-dataset ``schemas/<dataset>/schema.py``
    builders: a dataset is DECLARED (tables, keys, FK edges,
    irrelevant attributes), not coded. Round-trips through
    schema_from_json; consumed by the CLI's ``--schema_json``."""
    return {
        "tables": [
            {
                "name": t.table_name,
                "primary_key": list(t.primary_key),
                "irrelevant_attributes": list(t.irrelevant_attributes),
                "table_size": t.table_size,
                "sample_rate": t.sample_rate,
            }
            for t in g.tables.values()
        ],
        "relationships": [
            {
                "start": r.start,
                "start_attr": r.start_attr,
                "end": r.end,
                "end_attr": r.end_attr,
            }
            for r in g.relationships.values()
        ],
    }


def schema_from_json(d: dict) -> SchemaGraph:
    """Build a SchemaGraph from the schema_to_json dict. Validates
    that every relationship endpoint names a declared table (a typo'd
    edge would otherwise surface much later as a KeyError inside the
    trainer or compiler)."""
    g = SchemaGraph()
    if not d.get("tables"):
        # an empty/mis-keyed declaration would otherwise fall through
        # to the fixture TABLE_NAMES default inside load_tables
        # (`tables or TABLE_NAMES`) and silently run on tables the
        # user never declared
        raise ValueError(
            "schema declaration has no 'tables' — declare at least one "
            "table (keys: tables, relationships)"
        )
    for t in d.get("tables", []):
        g.add_table(
            Table(
                t["name"],
                list(t.get("primary_key", [])),
                irrelevant_attributes=list(t.get("irrelevant_attributes", [])),
                table_size=t.get("table_size"),
                sample_rate=float(t.get("sample_rate", 1.0)),
            )
        )
    for r in d.get("relationships", []):
        for side in ("start", "end"):
            if r[side] not in g.tables:
                raise ValueError(
                    f"relationship {r} references undeclared table "
                    f"'{r[side]}' — declare it under 'tables'"
                )
        g.add_relationship(r["start"], r["start_attr"], r["end"], r["end_attr"])
    return g


def load_schema_json(path: str) -> SchemaGraph:
    import json

    with open(path) as f:
        return schema_from_json(json.load(f))
