"""SPN ensemble: model registry + query routing + persistence
(reference: ensemble_compilation/spn_ensemble.py::SPNEnsemble,
read_ensemble — SURVEY.md §2 B11-B13, D6-D9).

Routing (reference: _greedily_select_first_cardinality_spn,
simplified): prefer the model whose table set exactly matches the
query; else the smallest model whose table set covers it (fewer extra
tables => fewer fanout corrections => tighter estimates). Expectation
results are memoized per (model, conditions, features) — the
reference's factor cache (B13).
"""

from __future__ import annotations

import pickle

from pyspark.sql import DataFrame

from ..plans.query import Query, QueryType
from ..plans.schema import SchemaGraph
from .learn import LearnParams
from .model import SPNModel
from .trainer import train_spn_model


class SPNEnsemble:
    def __init__(self, schema: SchemaGraph) -> None:
        self.schema = schema
        self.models: list[SPNModel] = []

    def add_model(self, model: SPNModel) -> None:
        self.models.append(model)

    # -- selection (B11) ----------------------------------------------
    def select_model(self, query: Query) -> SPNModel:
        exact = [m for m in self.models if m.table_set == query.table_set]
        if exact:
            return exact[0]
        covering = [m for m in self.models if query.table_set <= m.table_set]
        if not covering:
            raise ValueError(
                f"no model covers table set {sorted(query.table_set)}"
            )
        return min(covering, key=lambda m: len(m.table_set))

    # -- answering -----------------------------------------------------
    def cardinality(self, query: Query) -> float:
        return self.select_model(query).cardinality(query)

    def aqp(self, query: Query) -> list[dict]:
        return self.select_model(query).aqp(query)

    def answer(self, query: Query):
        if query.query_type is QueryType.CARDINALITY:
            return self.cardinality(query)
        return self.aqp(query)

    # -- persistence (D9) ---------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump({"models": self.models}, f)

    @classmethod
    def load(cls, path: str, schema: SchemaGraph) -> "SPNEnsemble":
        with open(path, "rb") as f:
            payload = pickle.load(f)
        ens = cls(schema)
        ens.models = payload["models"]
        return ens


# -- ensemble creation strategies (reference: ensemble_creation/) -----


def create_single_table_ensemble(
    catalog: dict[str, DataFrame],
    schema: SchemaGraph,
    tables: list[str],
    sample_budget: int = 100_000,
    params: LearnParams | None = None,
    seed: int = 42,
) -> SPNEnsemble:
    """One RSPN per base table (reference: naive.py::
    create_naive_all_split_ensemble, D6)."""
    ens = SPNEnsemble(schema)
    for t in tables:
        ens.add_model(
            train_spn_model(catalog, schema, {t}, sample_budget, params, seed)
        )
    return ens


def create_relationship_ensemble(
    catalog: dict[str, DataFrame],
    schema: SchemaGraph,
    relationship_ids: list[str],
    sample_budget: int = 100_000,
    params: LearnParams | None = None,
    seed: int = 42,
) -> SPNEnsemble:
    """One RSPN per FK edge — each model covers the 2-table outer join
    (reference: naive.py relationship strategy, D7)."""
    ens = SPNEnsemble(schema)
    for rid in relationship_ids:
        rel = schema.relationships[rid]
        ens.add_model(
            train_spn_model(
                catalog, schema, {rel.start, rel.end}, sample_budget, params, seed
            )
        )
    return ens
