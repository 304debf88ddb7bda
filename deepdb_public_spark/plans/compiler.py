"""Exact plane: Query IR -> Spark DataFrame.

This replaces the reference's Postgres ground-truth executor
(reference: ensemble_compilation/physical_db.py::DBConnection /
::TrueCardinalityEstimator) with Spark SQL. We only *declare* the
logical plan — scan, filter, join, aggregate — and let Catalyst do
predicate pushdown, column pruning, join reordering and
broadcast-vs-sort-merge selection (SURVEY.md §4.2). The only physical
hint we add ourselves is ``broadcast()`` on declared-small dimension
tables, driven by SchemaGraph metadata, so a 100 TB fact-side join
never shuffles the dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .query import (
    AggOperation,
    AggregationOperationType,
    AggregationType,
    Condition,
    Query,
)
from .schema import SchemaGraph


def condition_to_column(cond: Condition, resolver=None) -> Column:
    """Compile one condition to a boolean Column. ``resolver`` is an
    optional callable(Condition) -> Column that binds each leaf
    condition's column reference through a specific DataFrame's
    lineage (scans[table][column]) — required for post-join
    cross-table OR filters, where a bare F.col(name) would be
    ambiguous the moment two joined tables share a column name."""
    if cond.op == "OR":
        out = condition_to_column(cond.value[0], resolver)
        for sub in cond.value[1:]:
            out = out | condition_to_column(sub, resolver)
        return out
    col = resolver(cond) if resolver is not None else F.col(cond.column)
    if cond.op == "=":
        return col == F.lit(cond.value)
    if cond.op == "<>":
        return col != F.lit(cond.value)
    if cond.op == "<":
        return col < F.lit(cond.value)
    if cond.op == "<=":
        return col <= F.lit(cond.value)
    if cond.op == ">":
        return col > F.lit(cond.value)
    if cond.op == ">=":
        return col >= F.lit(cond.value)
    if cond.op == "BETWEEN":
        return col.between(F.lit(cond.value[0]), F.lit(cond.value[1]))
    if cond.op == "NOT_BETWEEN":
        # SQL three-valued logic: NULL rows fail both branches either
        # way, so plain negation matches engine semantics
        return ~col.between(F.lit(cond.value[0]), F.lit(cond.value[1]))
    if cond.op == "IN":
        return col.isin(list(cond.value))
    if cond.op == "NOT_IN":
        return ~col.isin(list(cond.value))
    if cond.op == "LIKE":
        return col.like(cond.value)
    if cond.op == "NOT_LIKE":
        return ~col.like(cond.value)
    if cond.op == "IS_NULL":
        return col.isNull()
    if cond.op == "IS_NOT_NULL":
        return col.isNotNull()
    raise ValueError(f"unknown operator {cond.op!r}")


def _agg_column(op: AggOperation, resolver=None) -> Column:
    # resolver binds (table, column) through the owning scan's lineage
    # — like join/OR conditions — so shared column names across joined
    # tables can't make the aggregate ambiguous; bare F.col is the
    # single-scan fallback
    def _c(t: str, c: str) -> Column:
        return resolver(t, c) if resolver is not None else F.col(c)

    if op.agg_type is AggregationType.COUNT:
        if op.distinct:
            return F.countDistinct(_c(*op.operands[0]))
        if op.operands:  # COUNT(col): NULLs don't count (SQL semantics)
            return F.count(_c(*op.operands[0]))
        return F.count(F.lit(1))
    expr = _c(*op.operands[0])
    for t, c in op.operands[1:]:
        expr = expr * _c(t, c)
    return F.sum(expr) if op.agg_type is AggregationType.SUM else F.avg(expr)


def build_agg_columns(
    aggregations: list[AggOperation], resolver=None
) -> list[Column]:
    """Fold the AGGREGATION/PLUS/MINUS sequence (reference A13) into
    Spark aggregate expressions, one output column per accumulated run."""
    out: list[Column] = []
    acc: Column | None = None
    alias: str | None = None
    for i, op in enumerate(aggregations):
        col = _agg_column(op, resolver)
        if op.op_type is AggregationOperationType.AGGREGATION:
            if acc is not None:
                out.append(acc.alias(alias or f"agg_{len(out)}"))
            acc, alias = col, op.alias
        elif op.op_type is AggregationOperationType.PLUS:
            acc = acc + col
            alias = op.alias or alias
        else:
            acc = acc - col
            alias = op.alias or alias
    if acc is not None:
        out.append(acc.alias(alias or f"agg_{len(out)}"))
    return out


class ExactCompiler:
    """Compile Query IR to a DataFrame over a table catalog.

    ``cardinality_estimator`` is the DeepDB optimizer-integration hook
    (SURVEY.md §4.3): PySpark exposes no supported way to inject
    learned cardinalities into Catalyst's cost model, so the idiomatic
    equivalent is join-strategy hints — when the model plane predicts
    a FILTERED table (even a fact table) fits under the broadcast
    threshold, hint broadcast and skip the shuffle entirely.
    """

    BROADCAST_ROW_THRESHOLD = 500_000

    # join-order DP is exact and cheap up to here (2^n masks; the
    # grammar's FK-join queries are ≤6 tables); beyond it, fall back
    # to the greedy attach order rather than blow up plan time
    JOIN_DP_MAX_TABLES = 12

    # a DP step whose attached side BROADCASTS shuffles nothing: its
    # intermediate is produced inside the same stage, so it is priced
    # at a small fraction of its rows (nonzero so ties among all-
    # broadcast orders still prefer smaller intermediates)
    DP_BROADCAST_STEP_WEIGHT = 1e-6

    def __init__(self, schema: SchemaGraph, catalog: dict[str, DataFrame]) -> None:
        self.schema = schema
        self.catalog = catalog
        # callable(table_name, query) -> estimated filtered row count,
        # or None when the model plane cannot answer
        self.cardinality_estimator = None
        # callable(frozenset[table], query) -> estimated rows of the
        # INTERMEDIATE join over that table subset (conditions + FK
        # edges restricted to the subset), or None. When set, compile()
        # runs a Selinger-style left-deep DP over connected subsets and
        # joins in the optimal order — DeepDB's optimizer pitch
        # (reference: learned cardinalities feeding the join-order
        # search) realized as: the model plane prices every candidate
        # intermediate, the DataFrame join order IS the join tree.
        self.join_cardinality_estimator = None
        # optional batch twin: callable(list[frozenset], query) ->
        # list[float | None], pricing a whole DP search round in one
        # tree pass per model (B8 at plan time); falls back to the
        # scalar estimator per subset when absent
        self.join_cardinality_estimator_batch = None

    def _scan(self, table: str, query: Query, joined_tables: int) -> DataFrame:
        """Scan one table with its filters applied pre-join (explicit
        pushdown; Catalyst would also push these through the join) and
        a broadcast hint when the schema declares it small — or when
        the learned estimator predicts the filtered scan is small."""
        df = self.catalog[table]
        conds = query.conditions_for(table)
        for cond in conds:
            df = df.filter(condition_to_column(cond))
        if joined_tables == 0:
            return df
        meta = self.schema.tables.get(table)
        if meta is not None and meta.is_dimension:
            return F.broadcast(df)
        if conds and self.cardinality_estimator is not None:
            est = self.cardinality_estimator(table, query)
            if est is not None and est < self.BROADCAST_ROW_THRESHOLD:
                return F.broadcast(df)
        return df

    def _dp_broadcastable(self, table: str, query: Query) -> bool:
        """Mirror of _scan's broadcast rule, consulted by the join DP:
        a declared-small dimension always broadcasts; a filtered table
        broadcasts when the learned estimator predicts its filtered
        rows under BROADCAST_ROW_THRESHOLD."""
        meta = self.schema.tables.get(table)
        if meta is not None and meta.is_dimension:
            return True
        if query.conditions_for(table) and self.cardinality_estimator is not None:
            est = self.cardinality_estimator(table, query)
            return est is not None and est < self.BROADCAST_ROW_THRESHOLD
        return False

    def _join_order_dp(self, query: Query, rels: list) -> list[str] | None:
        """Selinger-style left-deep join-order search priced by the
        learned estimator: minimize the SUM of estimated intermediate
        sizes over all prefixes (the classic cost of a left-deep
        pipeline — every intermediate is shuffled/probed once), with
        COST ASYMMETRY for broadcast steps: a step whose attached side
        broadcasts (per _dp_broadcastable, the same rule _scan applies
        when compiling) shuffles neither input, so its intermediate is
        discounted to DP_BROADCAST_STEP_WEIGHT of its rows. A plan
        that keeps a broadcastable side LATE can therefore beat a
        smaller-intermediate order that forces a shuffle at its
        biggest prefix.

        Only connected subsets are enumerated (an FK-join query's
        intermediates must stay connected, and the estimator would
        reject a cross product anyway). Returns the optimal table
        order, or None when the estimator is absent/fails or the
        query exceeds JOIN_DP_MAX_TABLES — callers fall back to the
        greedy most-selective-first attach."""
        est_fn = self.join_cardinality_estimator
        tables = sorted(query.table_set)
        n = len(tables)
        if est_fn is None or n < 3 or n > self.JOIN_DP_MAX_TABLES:
            return None
        idx = {t: i for i, t in enumerate(tables)}
        # adjacency bitmask per table over the query's edges
        adj = [0] * n
        for r in rels:
            if r.start in idx and r.end in idx:
                adj[idx[r.start]] |= 1 << idx[r.end]
                adj[idx[r.end]] |= 1 << idx[r.start]

        bc = [self._dp_broadcastable(t, query) for t in tables]

        card_cache: dict[int, float] = {}

        def card(mask: int) -> float | None:
            if mask not in card_cache:
                subset = frozenset(
                    t for i, t in enumerate(tables) if mask & (1 << i)
                )
                card_cache[mask] = est_fn(subset, query)
            return card_cache[mask]

        def price_round(need: list[int]) -> None:
            """Fill card_cache for this round's new masks — in ONE
            batch call when the batch estimator is wired (B8 at plan
            time: subsets sharing a model are one tree pass), else
            lazily per mask via card()."""
            batch_fn = self.join_cardinality_estimator_batch
            if not need or batch_fn is None:
                return
            subsets = [
                frozenset(
                    t for i2, t in enumerate(tables) if m & (1 << i2)
                )
                for m in need
            ]
            vals = batch_fn(subsets, query)
            if vals is not None and len(vals) == len(need):
                for m, v in zip(need, vals):
                    card_cache[m] = v

        # dp[mask] = (total intermediate cost, order) for connected mask
        dp: dict[int, tuple[float, list[str]]] = {
            1 << i: (0.0, [t]) for i, t in enumerate(tables)
        }
        frontier = list(dp)
        for _ in range(n - 1):
            # phase 1: discover every extension this round considers,
            # so the new masks can be priced together
            ext: list[tuple[int, int, int]] = []
            for mask in frontier:
                reach = 0
                for i in range(n):
                    if mask & (1 << i):
                        reach |= adj[i]
                reach &= ~mask
                for i in range(n):
                    if reach & (1 << i):
                        ext.append((mask, i, mask | (1 << i)))
            price_round(sorted({m2 for _m, _i, m2 in ext if m2 not in card_cache}))
            # phase 2: relax
            nxt: dict[int, tuple[float, list[str]]] = {}
            for mask, i, m2 in ext:
                cost, order = dp[mask]
                c2 = card(m2)
                if c2 is None:
                    return None  # estimator can't price it: greedy
                step = c2 * (
                    self.DP_BROADCAST_STEP_WEIGHT if bc[i] else 1.0
                )
                total = cost + step
                # each round extends popcount-k masks to k+1, so
                # m2 can only collide within this round's nxt
                if m2 not in nxt or total < nxt[m2][0]:
                    nxt[m2] = (total, order + [tables[i]])
            dp.update(nxt)
            frontier = list(nxt)
        full = (1 << n) - 1
        if full not in dp:
            return None  # disconnected — compile() raises later
        return dp[full][1]

    def compile(self, query: Query) -> DataFrame:
        rels = [self.schema.relationships[r] for r in sorted(query.relationship_set)]
        dp_order = self._join_order_dp(query, rels) if rels else None
        dp_rank = (
            {t: i for i, t in enumerate(dp_order)} if dp_order else None
        )
        # Join along the schema-graph path: start anywhere, repeatedly
        # attach an edge with exactly one side already joined.
        if dp_order:
            start = dp_order[0]
        else:
            start = rels[0].start if rels else next(iter(sorted(query.table_set)))
        # keep each table's scan DataFrame: join conditions reference
        # columns through their owning scan (lineage-bound), so shared
        # column names across tables can't make the condition ambiguous
        scans: dict[str, DataFrame] = {start: self._scan(start, query, 0)}
        df = scans[start]
        joined = {start}
        pending = list(rels)

        _attach_cost_memo: dict[str, float] = {}

        def _attach_cost(table: str) -> float:
            """Estimated filtered rows of a candidate table — the
            model plane driving join ORDER (DeepDB's optimizer pitch):
            attach the most selective side first so intermediates stay
            small. Falls back to declared table_size, then 'unknown
            last'. Spark may still reorder under CBO/AQE; without
            them the DataFrame join order IS the join tree. Memoized
            per compile: the greedy loop re-asks for the same table
            every round, and each ask is an SPN inference pass."""
            hit = _attach_cost_memo.get(table)
            if hit is not None:
                return hit
            cost = float("inf")
            if self.cardinality_estimator is not None:
                est = self.cardinality_estimator(table, query)
                if est is not None:
                    cost = float(est)
            if cost == float("inf"):
                meta = self.schema.tables.get(table)
                if meta is not None and meta.table_size is not None:
                    cost = float(meta.table_size)
            _attach_cost_memo[table] = cost
            return cost

        while pending:
            attachable = [
                rel
                for rel in pending
                if (rel.start in joined) != (rel.end in joined)
            ]
            done = [
                rel for rel in pending if rel.start in joined and rel.end in joined
            ]
            for rel in done:
                # cycle-closing edge (both endpoints already joined):
                # its equality is a real predicate of the query and
                # must be APPLIED as a filter, not dropped — e.g. a
                # supplier-nation + customer-nation cycle would
                # otherwise return rows violating the fifth edge
                df = df.filter(
                    scans[rel.start][rel.start_attr]
                    == scans[rel.end][rel.end_attr]
                )
                pending.remove(rel)
            if not attachable:
                if pending:
                    raise ValueError(f"join graph is disconnected: {pending}")
                break
            if dp_rank is not None:
                # follow the DP-optimal left-deep order; the cycle-
                # closing `done` handling above still applies extra
                # edges as filters
                rel = min(
                    attachable,
                    key=lambda r: dp_rank[
                        r.end if r.start in joined else r.start
                    ],
                )
            else:
                rel = min(
                    attachable,
                    key=lambda r: _attach_cost(
                        r.end if r.start in joined else r.start
                    ),
                )
            other = rel.end if rel.start in joined else rel.start
            scans[other] = self._scan(other, query, len(joined))
            df = df.join(
                scans[other],
                scans[rel.start][rel.start_attr] == scans[rel.end][rel.end_attr],
                "inner",
            )
            joined.add(other)
            pending.remove(rel)

        # cross-TABLE OR groups (Condition.table is None) reference
        # columns of several scans, so they cannot be pushed into any
        # single _scan — apply them once the join tree is complete
        # (Catalyst still prunes columns; the filter just can't reach
        # one parquet scan, which is inherent to the predicate). Each
        # leaf reference binds through its owning scan's lineage so
        # shared column names across tables stay unambiguous.
        for cond in query.conditions:
            if cond.table is None:
                df = df.filter(
                    condition_to_column(
                        cond,
                        resolver=lambda sub: scans[sub.table][sub.column],
                    )
                )

        def _lineage(t: str, c: str) -> Column:
            sc = scans.get(t)
            return sc[c] if sc is not None else F.col(c)

        # group/aggregate columns bind through their owning scan's
        # lineage like every other column reference here — bare
        # F.col(name) raised AMBIGUOUS_REFERENCE when two joined
        # tables share a column name the IR fully disambiguates
        group_cols = [_lineage(t, c) for t, c in query.group_bys]
        agg_cols = build_agg_columns(query.aggregations, resolver=_lineage)
        if not agg_cols:
            agg_cols = [F.count(F.lit(1)).alias("count")]
        out = (
            df.groupBy(*group_cols).agg(*agg_cols)
            if group_cols
            else df.agg(*agg_cols)
        )
        # HAVING extension: post-aggregation filters on output aliases
        # (Catalyst keeps this a filter above the final aggregate —
        # no extra shuffle)
        for alias, op, lit in query.having:
            out = out.filter(
                condition_to_column(Condition("", alias, op, lit))
            )
        return out
