"""Spark-side RSPN training driver (reference SURVEY.md §3.3: the
--generate_ensemble lifecycle, re-expressed as Spark jobs).

Division of labor at 100 TB:
- Spark: full-outer-join sample materialization with fanout columns
  (operators/prep.py — the reference's pandas bottleneck), dictionary
  encoding, exact relation sizes, and the bounded row sample that the
  recursion consumes (`df.sample(fraction).toPandas()` — never a full
  collect).
- Driver: the learn-MSPN recursion over the bounded sample (numpy,
  seeded) — same shape as the reference's 10M-rows-per-SPN design.

The resulting model is MB-scale and pickles (reference D9).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..operators.prep import encode_table, generate_join_sample
from ..plans.schema import SchemaGraph
from .learn import LearnParams, learn_spn
from .model import SPNModel
from .nodes import validate


def _column_tables(schema_columns: dict[str, list[str]]) -> dict[str, str]:
    return {c: t for t, cols in schema_columns.items() for c in cols}


def train_spn_model(
    catalog: dict[str, DataFrame],
    schema: SchemaGraph,
    table_set: set[str],
    sample_budget: int = 100_000,
    params: LearnParams | None = None,
    seed: int = 42,
    exclude_columns: set[str] | None = None,
    include_boundary_fanouts: bool = True,
) -> SPNModel:
    """Train one RSPN over the full-outer join of ``table_set``.

    ``include_boundary_fanouts`` additionally materializes mul_/nn_
    fanout columns for FK edges whose PARENT is inside the table set
    but whose child is outside (reference: prepare_single_tables.py
    attaches incoming-relationship multipliers to every table). These
    columns are what lets the ensemble factorize a query across
    models (B11): a model covering only the parent side of an edge can
    still weight parents by their child fanout. One groupBy+join per
    boundary edge — cheap relative to the outer-join chain."""
    rel_ids = sorted(
        r.identifier
        for r in schema.relationships.values()
        if r.start in table_set and r.end in table_set
    )
    rels = [schema.relationships[i] for i in rel_ids]
    joined = generate_join_sample(catalog, schema, table_set, set(rel_ids))

    boundary_rels = []
    if include_boundary_fanouts:
        from ..operators.prep import fanout_multiplier

        boundary_rels = sorted(
            (
                r
                for r in schema.relationships.values()
                if r.end in table_set and r.start not in table_set
            ),
            key=lambda r: r.identifier,
        )
        for rel in boundary_rels:
            joined = fanout_multiplier(joined, catalog[rel.start], rel)

    # drop PK/FK id columns from the model scope: they are join
    # plumbing, not predicate targets (the reference declares them
    # irrelevant_attributes); fanout mul_/nn_ columns stay.
    exclude = set(exclude_columns or set())
    for rel in rels:
        exclude |= {rel.start_attr, rel.end_attr}
    for t in table_set:
        exclude |= set(schema.tables[t].primary_key)
        for r in schema.relationships.values():
            if r.start == t:
                exclude.add(r.start_attr)
    keep = [c for c in joined.columns if c not in exclude]
    # persist: the outer-join chain feeds the row count, the encoding
    # stats/dictionaries AND the training sample — without it the
    # join re-executes per action (measurable at m01 scale)
    joined = joined.select(*keep).persist()
    try:
        full_join_size = joined.count()
        encoded, meta = encode_table(joined, "+".join(sorted(table_set)))
        model_cols = [c for c in encoded.columns if c in meta.columns]
        encoded = encoded.select(*model_cols)

        fraction = min(1.0, sample_budget / max(full_join_size, 1))
        pdf = encoded.sample(fraction=fraction, seed=seed).toPandas()
        data = pdf.to_numpy(dtype=np.float64, na_value=np.nan)
    finally:
        joined.unpersist()

    root = learn_spn(data, list(range(len(model_cols))), params or LearnParams())
    validate(root)

    column_table = {}
    for t in table_set:
        for c in catalog[t].columns:
            if c in model_cols:
                column_table[c] = t

    model = SPNModel(
        table_set=set(table_set),
        relationships=rels,
        full_join_size=float(full_join_size),
        column_names=model_cols,
        meta=meta,
        column_table=column_table,
        root=root,
        sample_size=len(data),
        boundary_rels=boundary_rels,
    )
    return model
