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

Job budget (round 9; the round-8 review ranked the incremental
entries the m-plane's dominant bench cost): each delta pays exactly
TWO Spark jobs — one fused stats pass (row count + unseen-categorical
validation, which used to be two separate jobs: a count and a
distinct+anti-join probe) and one data pass (bounded sample collect
or histogram melt). UPDATE fuses further: ``update_delta`` tags the
delete/insert deltas into one union, so both validations+counts ride
one stats job and both bounded samples one stratified ``sampleBy``
pass — two jobs for the whole update instead of six.

Unseen categorical values still reject LOUDLY (encode_with_meta maps
them to NULL codes, which would silently inflate null_prob): the
fused stats pass counts rows whose raw value is NOT NULL but whose
encoded value is (i.e. no dictionary code existed); only on that
error path does a second diagnostic job run to NAME example values
for the exception message.

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

_OP = "__op"  # update_delta's delete/insert tag column


def _iter_nodes(node):
    yield node
    for ch in getattr(node, "children", []):
        yield from _iter_nodes(ch)


def _dict_cols(model: SPNModel, df: DataFrame) -> list[str]:
    return [
        c
        for c in model.column_names
        if (cm := model.meta.columns.get(c)) is not None
        and cm.kind == "categorical"
        and cm.value_to_code is not None
        and c in df.columns
    ]


def _raise_unseen(
    model: SPNModel,
    delta_df: DataFrame,
    per_col_unseen: dict[str, int] | None = None,
) -> None:
    """ERROR PATH ONLY: name up to 3 unseen (column, value) pairs via
    the bounded melt + anti-join probe, then raise. The happy path
    never runs this job — the fused stats pass already proved
    something is unseen before calling here.

    The probe compares CAST-to-STRING forms while the fused detection
    uses the typed dictionary lookup; if they disagree (a non-string
    categorical whose typed lookup misses but whose string form
    matches) the probe comes back empty — in that case the message
    falls back to ``per_col_unseen``, the per-column unseen counts the
    fused stats pass already measured, instead of reading 'e.g. []'."""
    spark = delta_df.sparkSession
    dict_cols = _dict_cols(model, delta_df)
    stack = (
        f"stack({len(dict_cols)}, "
        + ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in dict_cols)
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
    pairs = [(r["__col"], r["__val"]) for r in unseen]
    detail = (
        f"e.g. {pairs}"
        if pairs
        else "string-form probe found no examples; per-column unseen "
        f"row counts from the stats pass: {per_col_unseen or {}}"
    )
    raise ValueError(
        f"delta has categorical values unseen at training time "
        f"({detail}); re-encode with an extended dictionary "
        "and retrain/extend the model instead of absorbing them "
        "as NULL"
    )


def _prepare_delta(
    model: SPNModel, delta_df: DataFrame, tagged: bool = False
) -> tuple[DataFrame, dict[str, int]]:
    """Encode a delta with the model's dictionaries and compute its
    row count(s) + unseen-categorical validation in ONE Spark job.

    Returns ``(enc, counts)``: ``enc`` projects the model columns as
    doubles (plus the ``__op`` tag when ``tagged``), ``counts`` maps
    tag -> row count ('' when untagged). Raises via _raise_unseen if
    any dictionary column carries a value with no code."""
    dict_cols = _dict_cols(model, delta_df)
    pre = delta_df
    flags = {c: f"__nn_{c}" for c in dict_cols}
    for c, fc in flags.items():
        pre = pre.withColumn(fc, F.col(c).isNotNull())
    enc = encode_with_meta(pre, model.meta)
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

    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(
            F.when(F.col(fc) & F.col(c).isNull(), 1).otherwise(0)
        ).alias(f"__u_{i}")
        for i, (c, fc) in enumerate(flags.items())
    ]
    if tagged:
        stat_rows = enc.groupBy(_OP).agg(*aggs).collect()
    else:
        stat_rows = enc.groupBy().agg(*aggs).collect()
    counts: dict[str, int] = {}
    per_col_unseen: dict[str, int] = {}
    for r in stat_rows:
        counts[r[_OP] if tagged else ""] = int(r["__n"])
        for i, c in enumerate(flags):
            u = int(r[f"__u_{i}"] or 0)
            if u:
                per_col_unseen[c] = per_col_unseen.get(c, 0) + u
    if per_col_unseen:
        _raise_unseen(model, delta_df, per_col_unseen)

    keep = [_OP] if tagged else []
    enc = enc.select(
        *keep, *[F.col(c).cast("double").alias(c) for c in model.column_names]
    )
    return enc, counts


def _melted_histograms(
    model: SPNModel, enc: DataFrame, tagged: bool = False
) -> dict[str, dict[str, tuple]]:
    """One-pass melt of every model column into (__col, __val) counts
    — the shared machinery behind the exact insert AND delete paths
    (they used to carry verbatim copies). With ``tagged``, the single
    pass also keys by the ``__op`` tag (update_delta). NaN counts as
    NULL, matching training (to_numpy(na_value=nan) -> Leaf.fit null
    mass): a NaN key would otherwise corrupt the leaf's sorted-unique
    values invariant and break searchsorted."""
    cols = model.column_names
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(f"'{c}', `{c}`" for c in cols)
        + ") AS (__col, __val)"
    )
    keys = [_OP, "__col", "__val"] if tagged else ["__col", "__val"]
    sel = enc.selectExpr(*([_OP] if tagged else []), stack)
    # Arrow collect (round 13, guide §4): the melted histogram is
    # 100-200k small rows, and row-at-a-time pickle + Row construction
    # cost ~1.4s per call (cProfile: fromInternal/_create_row dominate
    # the m10 rep). toArrow() moves the identical rows vectorized;
    # to_pylist yields plain scalars (None for SQL NULL), and the NaN
    # fold below maps float NaN into the NULL bucket exactly as the
    # old Row loop did.
    tbl = sel.groupBy(*keys).count().toArrow()
    # Group-slice instead of a per-row Python dict loop (round 13,
    # cProfile: the 200k-iteration setdefault/append loop cost ~0.5s
    # per call): sort by (tag, col) so each group is one contiguous
    # slice, find boundaries vectorized, and hand each group its
    # numpy slices directly (round 14 — the per-group list(zip(...))
    # plus to_pylist materialized 100-200k Python objects per call
    # that _apply_*_hist immediately re-packed into arrays). Arrow
    # NULLs surface as NaN in the float64 view exactly like real NaN
    # values, which is the NULL fold training uses; the appliers
    # split on isnan. Within-group order was arbitrary shuffle order
    # before and stays arbitrary — no consumer contract changes.
    import numpy as np

    sort_cols = ([_OP] if tagged else []) + ["__col"]
    tbl = tbl.sort_by([(c, "ascending") for c in sort_cols])
    n = tbl.num_rows
    if n == 0:
        return {}
    enc_keys = [tbl[c].dictionary_encode().combine_chunks() for c in sort_cols]
    key_codes = [
        k.indices.to_numpy(zero_copy_only=False) for k in enc_keys
    ]
    key_names = [k.dictionary.to_pylist() for k in enc_keys]
    change = np.zeros(n - 1, dtype=bool) if n > 1 else np.zeros(0, dtype=bool)
    for kc in key_codes:
        if n > 1:
            change |= np.diff(kc) != 0
    bounds = np.concatenate(
        [[0], np.flatnonzero(change) + 1, [n]]
    )
    vals = tbl["__val"].combine_chunks().to_numpy(zero_copy_only=False)
    cnts = tbl["count"].combine_chunks().to_numpy(zero_copy_only=False)
    col_codes, col_names = key_codes[-1], key_names[-1]
    out: dict[str, dict[str, tuple]] = {}
    for s, e in zip(bounds[:-1], bounds[1:]):
        tag = key_names[0][key_codes[0][s]] if tagged else ""
        out.setdefault(tag, {})[col_names[col_codes[s]]] = (
            vals[s:e],
            cnts[s:e],
        )
    return out


_EMPTY_F64 = np.array([], dtype=np.float64)


def _split_nulls(group: tuple | None) -> tuple[np.ndarray, np.ndarray, float]:
    """Split one melted-histogram group's (vals, cnts) numpy slices
    into (non-null vals, their cnts, null mass) — NaN is the NULL
    bucket (the melt's float64 view folds Arrow NULLs and real NaN
    values together, exactly matching training's NaN-as-NULL fold)."""
    if group is None:
        return _EMPTY_F64, _EMPTY_F64, 0.0
    vals, cnts = group
    nn = ~np.isnan(vals)
    return vals[nn], cnts[nn], float(cnts[~nn].sum())


def _apply_insert_hist(
    model: SPNModel, per_col: dict[str, tuple], n_total: int
) -> None:
    """Merge exact per-column histogram deltas into the leaves
    (sum-free models) and grow the row bookkeeping."""
    scale = model.sample_size / max(model.full_join_size, 1.0)
    for leaf in iter_leaves(model.root):
        name = model.column_names[leaf.scope[0]]
        vals, cnts, nulls = _split_nulls(per_col.get(name))
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


def _apply_delete_hist(
    model: SPNModel, per_col: dict[str, tuple], n_total: int
) -> None:
    """Subtract exact per-column histogram deltas (masses clamp at
    zero, Leaf.remove_counts) and shrink the row bookkeeping."""
    scale = model.sample_size / max(model.full_join_size, 1.0)
    for leaf in iter_leaves(model.root):
        name = model.column_names[leaf.scope[0]]
        vals, cnts, nulls = _split_nulls(per_col.get(name))
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


def _has_sum(model: SPNModel) -> bool:
    return any(isinstance(n, Sum) for n in _iter_nodes(model.root))


def absorb_delta(
    model: SPNModel,
    delta_df: DataFrame,
    sample_budget: int = 100_000,
    seed: int = 42,
) -> int:
    """Absorb a Spark delta into ``model`` without retraining and
    without any data-scale collect — two Spark jobs total (fused
    stats, then sample/melt). Returns the delta row count."""
    enc, counts = _prepare_delta(model, delta_df)
    n_total = counts.get("", 0)
    if n_total == 0:
        return 0

    if _has_sum(model):
        frac = min(1.0, sample_budget / n_total)
        sampled = enc.sample(fraction=frac, seed=seed) if frac < 1.0 else enc
        pdf = sampled.toPandas()
        rows = pdf.to_numpy(dtype=np.float64, na_value=np.nan)
        model.add_dataset(rows, n_total=n_total)
        return n_total

    per_col = _melted_histograms(model, enc).get("", {})
    _apply_insert_hist(model, per_col, n_total)
    return n_total


def remove_delta(
    model: SPNModel,
    delta_df: DataFrame,
    sample_budget: int = 100_000,
    seed: int = 42,
) -> int:
    """Incremental DELETE support — beyond the reference (DeepDB's
    paper handles inserts via add_dataset, D5, and lists deletes as
    future work). The Spark shapes mirror absorb_delta exactly
    (two jobs: fused stats, then sample/melt):

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
    enc, counts = _prepare_delta(model, delta_df)
    n_total = counts.get("", 0)
    if n_total == 0:
        return 0
    if n_total >= model.full_join_size:
        raise ValueError(
            f"delta deletes {n_total} rows but the model holds "
            f"{model.full_join_size:.0f}; retrain instead"
        )

    if _has_sum(model):
        frac = min(1.0, sample_budget / n_total)
        sampled = enc.sample(fraction=frac, seed=seed) if frac < 1.0 else enc
        pdf = sampled.toPandas()
        rows = pdf.to_numpy(dtype=np.float64, na_value=np.nan)
        model.remove_dataset(rows, n_total=n_total)
        return n_total

    per_col = _melted_histograms(model, enc).get("", {})
    _apply_delete_hist(model, per_col, n_total)
    return n_total


def update_delta(
    model: SPNModel,
    old_df: DataFrame,
    new_df: DataFrame,
    sample_budget: int = 100_000,
    seed: int = 42,
) -> tuple[int, int]:
    """Incremental UPDATE = delete ``old_df`` + insert ``new_df``,
    FUSED (round 9): the two deltas ride one tagged union, so the
    whole update costs TWO Spark jobs — one stats pass validating and
    counting both sides, then either one stratified ``sampleBy`` pass
    collecting both bounded samples (mixture models; each tag gets
    its own fraction so both samples honor ``sample_budget``) or one
    tag-keyed histogram melt (sum-free models). Equivalent to
    ``remove_delta(old) ; absorb_delta(new)`` — the delete is applied
    before the insert, matching that sequence's semantics — at a
    third of the Spark-job cost. Returns (n_deleted, n_inserted)."""
    tagged = old_df.withColumn(_OP, F.lit("del")).unionByName(
        new_df.withColumn(_OP, F.lit("ins"))
    )
    enc, counts = _prepare_delta(model, tagged, tagged=True)
    n_old, n_new = counts.get("del", 0), counts.get("ins", 0)
    if n_old == 0 and n_new == 0:
        return 0, 0
    if n_old >= model.full_join_size:
        raise ValueError(
            f"delta deletes {n_old} rows but the model holds "
            f"{model.full_join_size:.0f}; retrain instead"
        )

    if _has_sum(model):
        fracs = {
            "del": min(1.0, sample_budget / max(n_old, 1)),
            "ins": min(1.0, sample_budget / max(n_new, 1)),
        }
        pdf = enc.stat.sampleBy(_OP, fracs, seed).toPandas()
        cols = list(model.column_names)
        if n_old:
            rows = pdf[pdf[_OP] == "del"][cols].to_numpy(
                dtype=np.float64, na_value=np.nan
            )
            model.remove_dataset(rows, n_total=n_old)
        if n_new:
            rows = pdf[pdf[_OP] == "ins"][cols].to_numpy(
                dtype=np.float64, na_value=np.nan
            )
            model.add_dataset(rows, n_total=n_new)
        return n_old, n_new

    hists = _melted_histograms(model, enc, tagged=True)
    if n_old:
        _apply_delete_hist(model, hists.get("del", {}), n_old)
    if n_new:
        _apply_insert_hist(model, hists.get("ins", {}), n_new)
    return n_old, n_new
