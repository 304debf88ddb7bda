"""Seeded grammar fuzzer: random reference-grammar queries (SURVEY.md
§2 table A) through parse_query -> Query IR -> ExactCompiler, compared
row-for-row against DuckDB on the same parquet fixtures.

The fixture-light corpus pins 70 hand-written queries; this fuzzer
covers the combinatorial space around them (random connected join
subsets, random predicate mixes, random group-bys) with deterministic
seeds so failures reproduce. COUNT results compare exactly; SUM/AVG
within 1e-9 relative (double accumulation order differs by engine).
"""

from __future__ import annotations

import random

import duckdb
import pytest

from deepdb_public_spark.engine import Engine

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
]

# join graph (start.attr = end.attr), mirroring tpch_like_schema
EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
]

CATEGORICAL = {
    ("orders", "o_orderstatus"): ["F", "O", "P"],
    ("orders", "o_orderpriority"): ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    ("lineitem", "l_returnflag"): ["A", "N", "R"],
    ("lineitem", "l_linestatus"): ["F", "O"],
    ("part", "p_type"): ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"],
    ("part", "p_brand"): ["Brand#%d" % i for i in range(1, 21)],
    ("customer", "c_mktsegment"): ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
    ("region", "r_name"): ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    ("events", "event_type"): ["click", "view", "purchase", "signup", "error"],
}

NUMERIC = {
    ("lineitem", "l_quantity"): (1, 50, 0),
    ("lineitem", "l_discount"): (0.0, 0.1, 2),
    ("lineitem", "l_tax"): (0.0, 0.08, 2),
    ("orders", "o_totalprice"): (1000, 500000, 0),
    ("part", "p_size"): (1, 50, 0),
    ("customer", "c_acctbal"): (-900, 9950, 0),
    ("events", "value"): (0.0, 490.0, 1),
}

DATE = {
    ("orders", "o_orderdate"): ("1995-01-01", "1998-08-01"),
    ("lineitem", "l_shipdate"): ("1995-01-01", "1998-12-01"),
    ("events", "ts"): ("2024-01-03", "2024-01-28"),
}

SUMMABLE = {
    "lineitem": ["l_quantity", "l_discount", "l_extendedprice"],
    "orders": ["o_totalprice"],
    "part": ["p_retailprice", "p_size"],
    "customer": ["c_acctbal"],
    "events": ["value"],
}

GROUPABLE = {k: v for k, v in CATEGORICAL.items() if len(v) <= 6}


def _rand_tables(rng: random.Random) -> tuple[list[str], list[str]]:
    """Random connected table subset via a walk on the FK graph;
    returns (tables, join condition strings)."""
    n = rng.choice([1, 1, 2, 2, 2, 3, 3, 4])
    tabs = {rng.choice(TABLES)}
    joins = []
    while len(tabs) < n:
        cands = [e for e in EDGES if (e[0] in tabs) != (e[2] in tabs)]
        if not cands:
            break
        s, sa, t, ta = rng.choice(cands)
        tabs.update([s, t])
        joins.append(f"{s}.{sa} = {t}.{ta}")
    return sorted(tabs), joins


def _num_lit(lo, hi, dec, rng: random.Random) -> str:
    v = rng.uniform(lo, hi)
    return str(round(v, dec)) if dec else str(int(v))


def _rand_pred(tabs: list[str], rng: random.Random) -> str | None:
    kinds = []
    for (t, c), vals in CATEGORICAL.items():
        if t in tabs:
            kinds.append(("cat", t, c, vals))
    for (t, c), spec in NUMERIC.items():
        if t in tabs:
            kinds.append(("num", t, c, spec))
    for (t, c), spec in DATE.items():
        if t in tabs:
            kinds.append(("date", t, c, spec))
    if not kinds:
        return None
    kind, t, c, spec = rng.choice(kinds)
    if rng.random() < 0.08:  # NULL predicates on any column kind
        return f"{t}.{c} IS {'NOT ' if rng.random() < 0.7 else ''}NULL"
    if kind == "cat":
        op = rng.choice(["=", "=", "<>", "IN"])
        if op == "IN":
            chosen = rng.sample(spec, k=min(len(spec), rng.choice([1, 2, 3])))
            inner = ", ".join(f"'{v}'" for v in chosen)
            return f"{t}.{c} IN ({inner})"
        return f"{t}.{c} {op} '{rng.choice(spec)}'"
    if kind == "num":
        lo, hi, dec = spec
        op = rng.choice(["<", "<=", ">", ">=", "BETWEEN"])
        if op == "BETWEEN":
            a, b = sorted(
                (rng.uniform(lo, hi), rng.uniform(lo, hi))
            )
            fmt = (lambda x: str(round(x, dec))) if dec else (lambda x: str(int(x)))
            return f"{t}.{c} BETWEEN {fmt(a)} AND {fmt(b)}"
        return f"{t}.{c} {op} {_num_lit(lo, hi, dec, rng)}"
    lo, hi = spec
    yr = rng.randint(int(lo[:4]), int(hi[:4]))
    mo = rng.randint(1, 12)
    op = rng.choice([">=", "<", "<=", ">", "BETWEEN"])
    if op == "BETWEEN":
        yr2 = rng.randint(yr, int(hi[:4]))
        mo2 = rng.randint(mo if yr2 == yr else 1, 12)
        return (
            f"{t}.{c} BETWEEN DATE '{yr:04d}-{mo:02d}-01' "
            f"AND DATE '{yr2:04d}-{mo2:02d}-01'"
        )
    return f"{t}.{c} {op} DATE '{yr:04d}-{mo:02d}-01'"


def gen_query(seed: int) -> tuple[str, str]:
    """Returns (query_sql, mode) where mode in {count, group, agg}."""
    rng = random.Random(seed)
    tabs, joins = _rand_tables(rng)
    preds = []
    for _ in range(rng.choice([0, 1, 1, 2, 2, 3])):
        p = _rand_pred(tabs, rng)
        if p:
            preds.append(p)
    where = joins + preds
    where_sql = (" WHERE " + " AND ".join(where)) if where else ""
    from_sql = ", ".join(tabs)

    groupable = [(t, c) for (t, c) in GROUPABLE if t in tabs]
    summable = [(t, c) for t in tabs for c in SUMMABLE.get(t, [])]
    mode_roll = rng.random()
    if groupable and mode_roll < 0.3:
        t, c = rng.choice(groupable)
        return (
            f"SELECT {t}.{c}, COUNT(*) AS cnt FROM {from_sql}{where_sql} "
            f"GROUP BY {t}.{c}",
            "group",
        )
    if summable and mode_roll < 0.5:
        t, c = rng.choice(summable)
        agg = rng.choice(["SUM", "AVG"])
        return (
            f"SELECT {agg}({t}.{c}) AS v FROM {from_sql}{where_sql}",
            "agg",
        )
    return f"SELECT COUNT(*) AS cnt FROM {from_sql}{where_sql}", "count"


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF_DIR)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _duck_rows(con, sql):
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


@pytest.fixture(scope="module")
def model_eng(spark):
    """Engine with a 2-table ensemble for model-plane fuzzing."""
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.trainer import train_spn_model

    eng = Engine(spark, SF_DIR)
    ens = SPNEnsemble(eng.schema)
    ens.add_model(
        train_spn_model(eng.catalog, eng.schema, {"orders", "lineitem"}, 60_000)
    )
    eng.ensemble = ens
    return eng


def gen_model_query(seed: int) -> str:
    """Random cardinality query inside the {orders, lineitem} scope:
    0-2 predicates, optional FK join."""
    rng = random.Random(seed)
    if rng.random() < 0.5:
        tabs = [rng.choice(["orders", "lineitem"])]
        joins = []
    else:
        tabs = ["lineitem", "orders"]
        joins = ["orders.o_orderkey = lineitem.l_orderkey"]
    preds = []
    for _ in range(rng.choice([0, 1, 1, 2])):
        p = _rand_pred(tabs, rng)
        if p:
            preds.append(p)
    where = joins + preds
    where_sql = (" WHERE " + " AND ".join(where)) if where else ""
    return f"SELECT COUNT(*) AS cnt FROM {', '.join(sorted(tabs))}{where_sql}"


@pytest.mark.parametrize("seed", range(900, 940))
def test_fuzzed_model_estimate_within_budget(model_eng, seed):
    """Model-plane fuzz (SURVEY §5.2-2): the RSPN estimate for a
    random in-scope cardinality query must stay within a q-error
    budget of the exact answer — across the predicate space, not just
    hand-picked cases. Very selective predicates are rescaled: below
    50 true rows, absolute error against the sample resolution is the
    meaningful check, not the ratio."""
    sql = gen_model_query(seed)
    q = model_eng.parse(sql)
    est = float(model_eng.ensemble.cardinality(q))
    true = int(model_eng.query(q).collect()[0][0])
    if true < 50:
        assert abs(est - true) <= 500, f"{sql}: est {est} vs {true}"
    else:
        qerr = max(est / true, true / max(est, 1e-9))
        assert qerr <= 6.0, f"{sql}: est {est} vs {true} (qerr {qerr:.2f})"


def gen_aqp_query(seed: int) -> str:
    """Random AQP query on lineitem: SUM/AVG (optionally grouped by
    l_returnflag) under 0-2 predicates."""
    rng = random.Random(seed)
    agg = rng.choice(["SUM", "AVG"])
    col = rng.choice(["l_quantity", "l_extendedprice", "l_discount"])
    preds = []
    for _ in range(rng.choice([0, 1, 1, 2])):
        p = _rand_pred(["lineitem"], rng)
        if p:
            preds.append(p)
    where_sql = (" WHERE " + " AND ".join(preds)) if preds else ""
    if rng.random() < 0.4:
        return (
            f"SELECT lineitem.l_returnflag, {agg}(lineitem.{col}) AS v "
            f"FROM lineitem{where_sql} GROUP BY lineitem.l_returnflag"
        )
    return f"SELECT {agg}(lineitem.{col}) AS v FROM lineitem{where_sql}"


@pytest.mark.parametrize("seed", range(700, 730))
def test_fuzzed_model_aqp_within_budget(model_eng, seed):
    """AQP fuzz: model-plane SUM/AVG within 15% relative error of the
    exact plane wherever the cell is well-populated (>= 500 true
    rows); sparse cells are skipped — the sample resolution dominates
    there and the reference's evaluation does the same (error is
    reported against well-populated ground truth)."""
    sql = gen_aqp_query(seed)
    q = model_eng.parse(sql)
    model_rows = model_eng.ensemble.aqp(q)
    exact = [r.asDict() for r in model_eng.query(q).collect()]
    gb = [c for _t, c in q.group_bys]
    counts = {}
    if gb:
        cq = model_eng.parse(
            "SELECT lineitem.l_returnflag, COUNT(*) AS c FROM lineitem"
            + (" WHERE " + sql.split(" WHERE ")[1].split(" GROUP BY")[0]
               if " WHERE " in sql else "")
            + " GROUP BY lineitem.l_returnflag"
        )
        counts = {r[0]: r[1] for r in model_eng.query(cq).collect()}
    else:
        csql = "SELECT COUNT(*) AS c FROM lineitem" + (
            " WHERE " + sql.split(" WHERE ")[1] if " WHERE " in sql else ""
        )
        counts[()] = model_eng.query(model_eng.parse(csql)).collect()[0][0]

    def key(r):
        return tuple(r[c] for c in gb) if gb else ()

    model_by = {key(r): r for r in model_rows}
    for r in exact:
        k = key(r)
        n_true = counts.get(k[0] if gb else k, counts.get(k, 0))
        if n_true < 500:
            continue
        truth = [v for c, v in r.items() if c not in gb][0]
        assert k in model_by, f"{sql}: missing group {k}"
        est = [v for c, v in model_by[k].items() if c not in gb][0]
        rel = abs(est - truth) / max(abs(truth), 1e-9)
        assert rel <= 0.15, f"{sql} group {k}: est {est} vs {truth} (rel {rel:.3f})"


def _run_fuzz_case(eng, duck, seed):
    sql, mode = gen_query(seed)
    got = _rows(eng.query(sql))
    want = _duck_rows(duck, sql)
    if mode == "agg":
        assert len(got) == len(want) == 1
        g, w = got[0][0], want[0][0]
        if g is None or w is None:
            assert g == w, sql
        else:
            assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), sql
    else:
        assert got == want, sql


@pytest.mark.parametrize("seed", range(300, 380))
def test_fuzzed_query_matches_duckdb(eng, duck, seed):
    _run_fuzz_case(eng, duck, seed)


@pytest.mark.parametrize("seed", range(380, 420))
def test_fuzzed_query_matches_duckdb_extended(eng, duck, seed):
    """Second fuzz band: the generator also emits IS [NOT] NULL and
    date BETWEEN predicates (same-column conjunct intersections arise
    by chance in both bands)."""
    _run_fuzz_case(eng, duck, seed)


@pytest.mark.parametrize("seed", range(420, 470))
def test_fuzzed_query_matches_duckdb_events(eng, duck, seed):
    """Third fuzz band, run with the events table in the pool: random
    walks now cross the events->customer FK edge, mixing timestamp
    BETWEEN, categorical event_type, and numeric value predicates
    into the same combinatorial space (m11's second-dataset surface
    under fuzz instead of hand-picked cases)."""
    _run_fuzz_case(eng, duck, seed)


# ---------------------------------------------------- OR-group band


def _simple_pred_for_or(tabs: list[str], rng: random.Random) -> str | None:
    """Simple predicate for use inside a disjunction group (no nested
    parens; NULL predicates legal inside groups)."""
    return _rand_pred(tabs, rng)


def gen_query_or(seed: int) -> tuple[str, str]:
    """Like gen_query but guarantees at least one parenthesized OR
    group (the round-3 grammar extension): same-column groups exercise
    the range-union path, cross-column groups the post-join filter /
    inclusion-exclusion path."""
    rng = random.Random(10_000 + seed)
    tabs, joins = _rand_tables(rng)
    parts = []
    for _ in range(8):
        p = _rand_pred(tabs, rng)
        if p is not None and not p.startswith("("):
            parts.append(p)
        if len(parts) >= 4:
            break
    if len(parts) < 2:
        where_sql = (" WHERE " + " AND ".join(joins)) if joins else ""
        return (
            f"SELECT COUNT(*) AS cnt FROM {', '.join(tabs)}{where_sql}",
            "count",
        )
    k = rng.choice([2, 2, 3])
    group = "(" + " OR ".join(parts[:k]) + ")"
    preds = [group] + parts[k:k + 1]
    where = joins + preds
    where_sql = " WHERE " + " AND ".join(where)
    return (
        f"SELECT COUNT(*) AS cnt FROM {', '.join(tabs)}{where_sql}",
        "count",
    )


@pytest.mark.parametrize("seed", range(0, 40))
def test_fuzzed_or_groups_match_duckdb(eng, duck, seed):
    sql, _mode = gen_query_or(seed)
    got = _rows(eng.query(sql))
    want = _duck_rows(duck, sql)
    assert got == want, sql


@pytest.fixture(scope="module")
def events_model_eng(spark):
    """Engine with a single-table events model (m11's surface) for
    second-dataset model-plane fuzzing."""
    from deepdb_public_spark.spn.ensemble import SPNEnsemble
    from deepdb_public_spark.spn.trainer import train_spn_model

    eng = Engine(spark, SF_DIR)
    ens = SPNEnsemble(eng.schema)
    ens.add_model(train_spn_model(eng.catalog, eng.schema, {"events"}, 40_000))
    eng.ensemble = ens
    return eng


def gen_events_model_query(seed: int) -> str:
    """Random cardinality query over events: 0-2 predicates drawn from
    the shared pools (timestamp BETWEEN / categorical / numeric)."""
    rng = random.Random(seed)
    preds = []
    for _ in range(rng.choice([0, 1, 1, 2])):
        p = _rand_pred(["events"], rng)
        if p:
            preds.append(p)
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    return f"SELECT COUNT(*) AS cnt FROM events{where}"


@pytest.mark.parametrize("seed", range(940, 970))
def test_fuzzed_events_model_estimate(events_model_eng, seed):
    """Second-dataset model-plane fuzz: the events RSPN estimate must
    stay within budget across random timestamp/categorical/numeric
    predicate mixes — the same budgets as the {orders, lineitem}
    band."""
    sql = gen_events_model_query(seed)
    q = events_model_eng.parse(sql)
    est = float(events_model_eng.ensemble.cardinality(q))
    true = int(events_model_eng.query(q).collect()[0][0])
    if true < 50:
        assert abs(est - true) <= 500, f"{sql}: est {est} vs {true}"
    else:
        qerr = max(est / true, true / max(est, 1e-9))
        assert qerr <= 6.0, f"{sql}: est {est} vs {true} (qerr {qerr:.2f})"
