"""Distributed incremental inserts (reference D5: aqp_spn/
aqp_spn.py::AQPSPN.add_dataset), Spark-side.

The round-1 driver entry collected the ENTIRE delta to the driver
(``delta.toPandas()``) — a driver OOM at 100 TB. Here the data-scale
work stays in Spark:

- Sum-free models (pure product-of-leaves): EXACT per-column
  histogram deltas via one melt + groupBy(column, value) pass —
  a single shuffle bounded by the distinct-value counts, zero row
  collect — merged into the leaves driver-side.
- Models with Sum nodes: routing new rows to mixture components
  needs row vectors, so a BOUNDED sample (<= ``sample_budget`` rows)
  is drawn from the delta and absorbed together with the TRUE delta
  count; ``SPNModel.add_dataset`` weights the sampled mass so the
  delta's effective share matches n_delta / full_join_size.

The delta is expressed in the model's relation (for single-table
models: table rows), exactly the reference's add_dataset contract.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.prep import encode_with_meta
from .leaves import Leaf
from .model import SPNModel
from .nodes import Sum, iter_leaves


def _iter_nodes(node):
    yield node
    for ch in getattr(node, "children", []):
        yield from _iter_nodes(ch)


def _encoded_delta(model: SPNModel, delta_df: DataFrame) -> DataFrame:
    """Shared validation + encoding for insert/delete deltas."""
    # Reject unseen categorical values LOUDLY: encode_with_meta maps
    # them to NULL codes, which would silently inflate null_prob and
    # give the real value zero mass (prep.py's contract says callers
    # must re-encode with an extended dictionary). ONE bounded probe
    # for ALL dictionary columns (round 7: the per-column probe ran a
    # separate distinct+anti-join job per dictionary column; melting
    # the columns into (__col, __val) pairs checks every dictionary
    # in a single scan of the delta).
    spark = delta_df.sparkSession
    dict_cols = [
        c
        for c in model.column_names
        if (cm := model.meta.columns.get(c)) is not None
        and cm.kind == "categorical"
        and cm.value_to_code is not None
        and c in delta_df.columns
    ]
    if dict_cols:
        stack = (
            f"stack({len(dict_cols)}, "
            + ", ".join(
                f"'{c}', CAST(`{c}` AS STRING)" for c in dict_cols
            )
            + ") AS (__col, __val)"
        )
        dict_df = spark.createDataFrame(
            [
                (c, str(v))
                for c in dict_cols
                for v in model.meta.columns[c].value_to_code
            ],
            "__col string, __val string",
        )
        unseen = (
            delta_df.selectExpr(stack)
            .where(F.col("__val").isNotNull())
            .distinct()
            .join(F.broadcast(dict_df), ["__col", "__val"], "left_anti")
            .limit(3)
            .collect()
        )
        if unseen:
            pairs = [(r["__col"], r["__val"]) for r in unseen]
            raise ValueError(
                f"delta has categorical values unseen at training time "
                f"(e.g. {pairs}); re-encode with an extended dictionary "
                "and retrain/extend the model instead of absorbing them "
                "as NULL"
            )
    enc = encode_with_meta(delta_df, model.meta)
    # boundary fanout columns (B11) describe children REFERENCING the
    # inserted rows — at insert time new parents have none, so mul=0 /
    # nn=0 (children arriving later update their own models; the
    # parent-side fanout histogram refreshes on the next retrain)
    for rel in model.boundary_rels:
        for c, default in (
            (rel.multiplier_attribute_name, 0.0),
            (rel.null_indicator_name, 0.0),
        ):
            if c not in enc.columns:
                enc = enc.withColumn(c, F.lit(default))
    missing = [c for c in model.column_names if c not in enc.columns]
    if missing:
        raise ValueError(f"delta lacks model columns {missing}")
    return enc.select(
        *[F.col(c).cast("double").alias(c) for c in model.column_names]
    )



def _melted_histograms(model: SPNModel, enc: DataFrame) -> dict[str, list]:
    """One-pass melt of every model column into (__col, __val) counts
    — the shared machinery behind the exact insert AND delete paths
    (they used to carry verbatim copies). NaN counts as NULL, matching
    training (to_numpy(na_value=nan) -> Leaf.fit null mass): a NaN key
    would otherwise corrupt the leaf's sorted-unique values invariant
    and break searchsorted."""
    cols = model.column_names
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(f"'{c}', `{c}`" for c in cols)
        + ") AS (__col, __val)"
    )
    hist = enc.selectExpr(stack).groupBy("__col", "__val").count().collect()
    per_col: dict[str, list] = {}
    for r in hist:
        v = r["__val"]
        if v is not None and v != v:  # NaN -> NULL bucket
            v = None
        per_col.setdefault(r["__col"], []).append((v, r["count"]))
    return per_col


def absorb_delta(
    model: SPNModel,
    delta_df: DataFrame,
    sample_budget: int = 100_000,
    seed: int = 42,
) -> int:
    """Absorb a Spark delta into ``model`` without retraining and
    without any data-scale collect. Returns the delta row count."""
    n_total = delta_df.count()
    if n_total == 0:
        return 0
    enc = _encoded_delta(model, delta_df)

    if any(isinstance(n, Sum) for n in _iter_nodes(model.root)):
        frac = min(1.0, sample_budget / n_total)
        sampled = enc.sample(fraction=frac, seed=seed) if frac < 1.0 else enc
        pdf = sampled.toPandas()
        rows = pdf.to_numpy(dtype=np.float64, na_value=np.nan)
        model.add_dataset(rows, n_total=n_total)
        return n_total

    # exact path: one melt pass for every histogram delta at once
    per_col = _melted_histograms(model, enc)

    scale = model.sample_size / max(model.full_join_size, 1.0)
    for leaf in iter_leaves(model.root):
        name = model.column_names[leaf.scope[0]]
        entries = per_col.get(name, [])
        vals = np.array([v for v, _c in entries if v is not None])
        cnts = np.array([c for v, c in entries if v is not None])
        nulls = sum(c for v, c in entries if v is None)
        prior = getattr(leaf, "n_rows", model.sample_size)
        leaf.absorb_counts(vals, cnts, nulls, prior, scale)
        leaf.n_rows = prior + n_total * scale
    for node in _iter_nodes(model.root):
        if not isinstance(node, Leaf):
            node.n_rows = (
                getattr(node, "n_rows", model.sample_size) + n_total * scale
            )
    model.sample_size += n_total * scale
    model.full_join_size += n_total
    model.invalidate_cache()
    return n_total


def remove_delta(
    model: SPNModel,
    delta_df: DataFrame,
    sample_budget: int = 100_000,
    seed: int = 42,
) -> int:
    """Incremental DELETE support — beyond the reference (DeepDB's
    paper handles inserts via add_dataset, D5, and lists deletes as
    future work). The Spark shapes mirror absorb_delta exactly:

    - Sum-free models: EXACT per-column histogram subtraction via the
      same one-pass melt + groupBy — masses clamp at zero
      (Leaf.remove_counts), so over-deletion of a value drops the
      value instead of going negative.
    - Models with Sum nodes: a BOUNDED weighted sample of the deleted
      rows routes down the stored cluster centers and decrements
      mixture weights + leaf masses (SPNModel.remove_dataset).

    ``delta_df`` must contain the rows being deleted (same contract
    as the insert path: callers supply the delta relation). Returns
    the deleted row count."""
    n_total = delta_df.count()
    if n_total == 0:
        return 0
    if n_total >= model.full_join_size:
        raise ValueError(
            f"delta deletes {n_total} rows but the model holds "
            f"{model.full_join_size:.0f}; retrain instead"
        )
    enc = _encoded_delta(model, delta_df)

    if any(isinstance(n, Sum) for n in _iter_nodes(model.root)):
        frac = min(1.0, sample_budget / n_total)
        sampled = enc.sample(fraction=frac, seed=seed) if frac < 1.0 else enc
        pdf = sampled.toPandas()
        rows = pdf.to_numpy(dtype=np.float64, na_value=np.nan)
        model.remove_dataset(rows, n_total=n_total)
        return n_total

    per_col = _melted_histograms(model, enc)

    scale = model.sample_size / max(model.full_join_size, 1.0)
    for leaf in iter_leaves(model.root):
        name = model.column_names[leaf.scope[0]]
        entries = per_col.get(name, [])
        vals = np.array([v for v, _c in entries if v is not None])
        cnts = np.array([c for v, c in entries if v is not None])
        nulls = sum(c for v, c in entries if v is None)
        prior = getattr(leaf, "n_rows", model.sample_size)
        leaf.n_rows = leaf.remove_counts(vals, cnts, nulls, prior, scale)
    for node in _iter_nodes(model.root):
        if not isinstance(node, Leaf):
            node.n_rows = max(
                0.0,
                getattr(node, "n_rows", model.sample_size) - n_total * scale,
            )
    model.sample_size = max(1.0, model.sample_size - n_total * scale)
    model.full_join_size -= n_total
    model.invalidate_cache()
    return n_total
