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
from .nodes import Sum, validate


def _column_tables(schema_columns: dict[str, list[str]]) -> dict[str, str]:
    return {c: t for t, cols in schema_columns.items() for c in cols}


def _mllib_top_split(
    encoded: DataFrame,
    model_cols: list[str],
    sample_budget: int,
    params: LearnParams,
    seed: int,
    timings: dict | None = None,
):
    """Top-level Sum split with pyspark.ml KMeans (SURVEY §7.3 / D3
    scale path): when one SPN's sample budget exceeds driver memory,
    the FIRST row split runs data-parallel over the full encoded
    relation; each cluster then fits in a bounded driver sample and
    the numpy recursion continues underneath. Cluster centers are
    stored in the same min-max-scaled space scale_minmax uses, so
    incremental-insert routing (D5) works identically."""
    import time as _time

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    def _mark(key, t0):
        if timings is not None:
            timings[key] = round(_time.perf_counter() - t0, 3)
        return _time.perf_counter()

    t0 = _time.perf_counter()
    stats = encoded.agg(
        *[F.min(c).alias(f"lo_{c}") for c in model_cols],
        *[F.max(c).alias(f"hi_{c}") for c in model_cols],
        *[F.avg(c).alias(f"mu_{c}") for c in model_cols],
        F.count(F.lit(1)).alias("__n"),
    ).collect()[0]
    lo = np.array([float(stats[f"lo_{c}"] or 0.0) for c in model_cols])
    hi = np.array([float(stats[f"hi_{c}"] or 0.0) for c in model_cols])
    mu = [float(stats[f"mu_{c}"] or 0.0) for c in model_cols]
    span = hi - lo
    t0 = _mark("scan_minmax_stats", t0)

    # mirror scale_minmax: (x - lo)/span when span > 0 else 0; NULL ->
    # column mean (then scaled)
    scaled = []
    for j, c in enumerate(model_cols):
        filled = F.coalesce(F.col(c).cast("double"), F.lit(mu[j]))
        if span[j] > 0:
            scaled.append((filled - F.lit(float(lo[j]))) / F.lit(float(span[j])))
        else:
            scaled.append(F.lit(0.0))
    feat = encoded.withColumn("__f", array_to_vector(F.array(*scaled)))
    km = KMeans(k=params.n_clusters, seed=seed, maxIter=20, featuresCol="__f")
    # fit on the BOUNDED sample, assign on the full relation (round 12:
    # at 10x scale MLlib's 20 Lloyd iterations over the full 6M-row
    # join were 121s of a 202s training wall; cluster structure from a
    # sample_budget-sized draw is statistically the same split, and
    # kmodel.transform is a single JVM projection pass either way —
    # the same fit-on-sample/assign-on-all shape as
    # operators/similarity.kmeans_refine's literal-centroid assign).
    # The recursion underneath resamples per cluster, so fit rows are
    # never reused as training rows.
    n_rows = int(stats["__n"])
    fit_frac = min(1.0, sample_budget / max(n_rows, 1))
    fit_src = feat if fit_frac >= 1.0 else feat.sample(
        fraction=fit_frac, seed=seed
    )
    kmodel = km.fit(fit_src)
    t0 = _mark("kmeans_fit", t0)
    # persist: the sizes collect and every per-cluster sample re-ran
    # the encode joins + transform over the full relation otherwise
    # (k+1 full passes on the training hot path)
    assigned = (
        kmodel.transform(feat).withColumnRenamed("prediction", "__c").persist()
    )
    sizes = {
        r["__c"]: r["cnt"]
        for r in assigned.groupBy("__c").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(sizes.values())
    t0 = _mark("assign_cluster_sizes", t0)
    frac = min(1.0, sample_budget / max(total, 1))
    children, weights, n_sampled = [], [], 0
    centers = np.array(kmodel.clusterCenters())
    kept_centers = []
    for c in sorted(sizes):
        part = (
            assigned.filter(F.col("__c") == c)
            .select(*model_cols)
            .sample(fraction=frac, seed=seed)
            .toPandas()
        )
        data = part.to_numpy(dtype=np.float64, na_value=np.nan)
        if len(data) == 0:
            continue
        child = learn_spn(
            data, list(range(len(model_cols))), params, _depth=1
        )
        children.append(child)
        weights.append(sizes[c] / total)
        kept_centers.append(centers[c])
        n_sampled += len(data)
    _mark("per_cluster_sample_and_learn", t0)
    assigned.unpersist()
    if len(children) == 1:
        return children[0], n_sampled
    wsum = sum(weights)
    root = Sum([w / wsum for w in weights], children, np.array(kept_centers))
    root.scale_lo, root.scale_hi = lo, hi
    root.scale_mean = np.array(mu)  # training-mean NULL imputation (D5 routing)
    root.n_rows = n_sampled
    return root, n_sampled


def train_spn_model(
    catalog: dict[str, DataFrame],
    schema: SchemaGraph,
    table_set: set[str],
    sample_budget: int = 100_000,
    params: LearnParams | None = None,
    seed: int = 42,
    exclude_columns: set[str] | None = None,
    include_boundary_fanouts: bool = True,
    driver_row_limit: int = 500_000,
    use_functional_dependencies: bool = False,
    fd_domain_cap: int = 10_000,
) -> SPNModel:
    """Train one RSPN over the full-outer join of ``table_set``.

    ``include_boundary_fanouts`` additionally materializes mul_/nn_
    fanout columns for FK edges whose PARENT is inside the table set
    but whose child is outside (reference: prepare_single_tables.py
    attaches incoming-relationship multipliers to every table). These
    columns are what lets the ensemble factorize a query across
    models (B11): a model covering only the parent side of an edge can
    still weight parents by their child fanout. One groupBy+join per
    boundary edge — cheap relative to the outer-join chain.

    When ``sample_budget`` exceeds ``driver_row_limit``, the first
    row split runs data-parallel in pyspark.ml KMeans and only
    per-cluster samples reach the driver (_mllib_top_split, D3 scale
    path).

    C7 sample-rate bookkeeping: if any member table declares
    ``Table.sample_rate < 1`` (the staged data is itself a row
    sample), the observed join size is scaled by 1/prod(rates) so
    COUNT/SUM estimates refer to the FULL data. Multiplier
    histograms observed on sampled children are still the sampled
    fanouts — an accepted approximation, as in the reference.

    C3: with ``use_functional_dependencies``, exact FDs a -> b among
    each member table's string columns drop the implied column b from
    the model scope (smaller SPNs, same answers); the b -> {a values}
    mapping (bounded by ``fd_domain_cap`` determinant values) is kept
    on the model so conditions on b rewrite to determinant ranges
    (reference: prepare_single_tables.py fd_dict +
    hierarchy translation at estimate time)."""
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
        # schema-declared irrelevant_attributes (reference C1:
        # prepare_single_tables.py drops them before modeling)
        exclude |= set(schema.tables[t].irrelevant_attributes)
        for r in schema.relationships.values():
            if r.start == t:
                exclude.add(r.start_attr)
    fd_maps: dict[str, tuple[str, dict]] = {}
    if use_functional_dependencies:
        from ..operators.prep import functional_dependencies

        for t in sorted(table_set):
            base = catalog[t]
            cand = [
                f.name
                for f in base.schema.fields
                if f.dataType.typeName() == "string" and f.name not in exclude
            ]
            if len(cand) < 2:
                continue
            for a, b in functional_dependencies(base, cand):
                # drop b (implied); keep determinants un-dropped and
                # one determinant per dropped column. A column serving
                # as a determinant must NEVER itself be dropped by a
                # later FD (transitive chain city->state->country):
                # conditions on its dependents rewrite onto it, so it
                # has to stay in model scope.
                determinants = {d for d, _m in fd_maps.values()}
                if b in fd_maps or a in fd_maps or b in determinants:
                    continue
                pairs = base.select(a, b).distinct().limit(fd_domain_cap + 1).collect()
                if len(pairs) > fd_domain_cap:
                    continue
                mapping: dict = {}
                for r in pairs:
                    mapping.setdefault(r[b], []).append(r[a])
                fd_maps[b] = (a, mapping)
        exclude |= set(fd_maps)

    keep = [c for c in joined.columns if c not in exclude]
    # persist: the outer-join chain feeds the row count, the encoding
    # stats/dictionaries AND the training sample — without it the
    # join re-executes per action (measurable at m01 scale)
    joined = joined.select(*keep).persist()
    params = params or LearnParams()
    import time as _time

    timings: dict = {}
    _t = _time.perf_counter()
    try:
        observed_size = joined.count()
        timings["join_materialize_count"] = round(_time.perf_counter() - _t, 3)
        if observed_size == 0:
            # fail at the cause: an empty relation otherwise surfaces
            # as an opaque 'leaf mass 0 != 1' assertion deep in
            # validate() (or nothing at all under python -O)
            raise ValueError(
                f"cannot train over {sorted(table_set)}: the joined "
                "relation is empty (empty staged tables or an "
                "over-aggressive sampling fraction?)"
            )
        # Tiny relations (dimension tables / snowflake arms): a slice
        # floor ABOVE the row count forbids every row split, forcing
        # the whole model into one naive-independence product — a
        # 25-row nation⋈region model then spreads P(n_name ∧ r_name)
        # over all name×region cells and grouped grids prune to
        # EMPTY at the 0.5-expected-rows threshold. Adapt the floor
        # to the sample so at least ~2 split levels are possible; the
        # configured value still rules at normal scales (the
        # reference's 10M-sample regime never hits this: its
        # min_instances_slice is always << rows).
        _eff = min(observed_size, sample_budget)
        if params.adaptive_slice_floor and params.min_instances_slice > max(
            4, _eff // 4
        ):
            import dataclasses as _dc

            params = _dc.replace(
                params, min_instances_slice=max(4, _eff // 4)
            )
        _t = _time.perf_counter()
        encoded, meta = encode_table(joined, "+".join(sorted(table_set)))
        timings["encode_dictionaries"] = round(_time.perf_counter() - _t, 3)
        _t = _time.perf_counter()
        # beyond-dict-cap categoricals (value_to_code None) leave model
        # scope entirely: their literals are untranslatable, so keeping
        # them would let predicates silently estimate 0 (the reference
        # likewise excludes such columns from SPN scope)
        model_cols = [
            c
            for c in encoded.columns
            if c in meta.columns
            and not (
                meta.columns[c].kind == "categorical"
                and meta.columns[c].value_to_code is None
            )
        ]
        # leaf compaction must skip dictionary-coded scopes (exact
        # code matching breaks on merged bin means) — tell learn_spn
        # which scope indices are categorical
        import dataclasses as _dc

        params = _dc.replace(
            params,
            categorical_scopes=frozenset(
                j
                for j, c in enumerate(model_cols)
                if meta.columns[c].kind == "categorical"
            ),
        )

        if sample_budget > driver_row_limit and observed_size > driver_row_limit:
            root, n_sample = _mllib_top_split(
                encoded.select(*model_cols), model_cols, sample_budget, params,
                seed, timings,
            )
            timings["top_split_total"] = round(_time.perf_counter() - _t, 3)
        else:
            # sample FIRST, then apply the dictionary mapping joins
            # (broadcast, row-wise) to the sample only — the
            # dictionaries/meta still come from the full relation
            # above, but the encode joins touch sample_budget rows
            # instead of the whole join
            from ..operators.prep import encode_with_meta

            fraction = min(1.0, sample_budget / max(observed_size, 1))
            # model_cols already excludes every beyond-dict-cap
            # categorical (value_to_code None), so the sample can
            # always re-encode via the driver-side dictionaries
            src = encode_with_meta(
                joined.sample(fraction=fraction, seed=seed), meta
            ).select(*model_cols)
            pdf = src.toPandas()
            data = pdf.to_numpy(dtype=np.float64, na_value=np.nan)
            root = learn_spn(data, list(range(len(model_cols))), params)
            n_sample = len(data)
            timings["driver_sample_and_learn"] = round(
                _time.perf_counter() - _t, 3
            )
    finally:
        joined.unpersist()

    validate(root)

    # C7: scale the observed (staged-sample) join size up to the full
    # data. Independent per-table Bernoulli samples of rates r_t keep
    # a joined tuple with probability prod(r_t).
    rate = 1.0
    for t in table_set:
        rate *= schema.tables[t].sample_rate
    full_join_size = observed_size / max(rate, 1e-12)

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
        sample_size=n_sample,
        boundary_rels=boundary_rels,
        fd_maps=fd_maps,
    )
    # phase wall times of THIS training run (not persisted state, a
    # diagnostic: tools/train_at_scale.py and SCALING.md consume it)
    model.train_timings = timings
    return model
