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

    def confidence_interval(self, query: Query, confidence: float = 0.95):
        return self.select_model(query).confidence_interval(query, confidence)

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


def create_rdc_ensemble(
    catalog: dict[str, DataFrame],
    schema: SchemaGraph,
    tables: list[str],
    max_join_models: int = 2,
    rdc_sample: int = 5_000,
    rdc_threshold: float = 0.3,
    sample_budget: int = 100_000,
    params: LearnParams | None = None,
    seed: int = 42,
) -> SPNEnsemble:
    """Correlation-driven ensemble selection (reference:
    ensemble_creation/rdc_based.py::candidate_evaluation, D8).

    For every FK edge among ``tables``, draw a small inner-join sample
    and measure the maximum RDC between column pairs that CROSS the
    edge. Edges whose tables are genuinely correlated get a join model
    (budget: ``max_join_models``, strongest correlations first —
    learning the joint distribution pays off exactly when independence
    would mis-estimate); every table additionally gets a single-table
    model so all scopes stay answerable. The RDC probe itself runs on
    driver-side samples (the reference subsamples identically)."""
    import numpy as np

    from ..operators.prep import encode_table
    from .rdc import rdc_matrix

    edges = [
        r
        for r in schema.relationships.values()
        if r.start in tables and r.end in tables
    ]
    scored = []
    for rel in edges:
        joined = catalog[rel.start].join(
            catalog[rel.end],
            catalog[rel.start][rel.start_attr] == catalog[rel.end][rel.end_attr],
        )
        frac = min(1.0, rdc_sample / max(joined.count(), 1))
        enc, meta = encode_table(joined.sample(frac, seed=seed), f"probe_{rel.start}")
        cols = [c for c in enc.columns if c in meta.columns]
        pdf = enc.select(*cols).toPandas()
        data = pdf.to_numpy(dtype=np.float64, na_value=np.nan)
        mat = rdc_matrix(data, seed=seed, max_rows=rdc_sample)
        start_cols = [
            i for i, c in enumerate(cols) if c in catalog[rel.start].columns
        ]
        end_cols = [i for i, c in enumerate(cols) if c in catalog[rel.end].columns]
        cross = max(
            (mat[i, j] for i in start_cols for j in end_cols), default=0.0
        )
        scored.append((cross, rel))

    ens = SPNEnsemble(schema)
    scored.sort(key=lambda t: -t[0])
    for cross, rel in scored[:max_join_models]:
        if cross >= rdc_threshold:
            ens.add_model(
                train_spn_model(
                    catalog, schema, {rel.start, rel.end}, sample_budget, params, seed
                )
            )
    for t in tables:
        ens.add_model(train_spn_model(catalog, schema, {t}, sample_budget, params, seed))
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
