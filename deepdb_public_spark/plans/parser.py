"""SQL front end for the reference grammar (SURVEY.md §2 table A).

Port of the reference's regex parser (reference:
evaluation/utils.py::parse_query) to our Query IR. The accepted
fragment is intentionally identical to the reference:

  SELECT <agg-list | COUNT(*)>
  FROM t1 [a1], t2 [a2], ...
  WHERE <FK equi-joins AND conjunctive predicates>
  [GROUP BY t.a, ...]

Predicates: =, <>, !=, <, <=, >, >=, BETWEEN, IN, IS [NOT] NULL —
conjunctions only, as in the reference, PLUS one extension the
reference lacks (SURVEY.md §2 table E): a parenthesized disjunction
group ``(t.c < 5 OR t.c > 45)``. Same-column groups compile to one
OR-condition the model plane evaluates as a range union; cross-column
groups (up to MAX_OR_DISJUNCTS disjuncts) are answered exactly by the
exact plane and via inclusion-exclusion by the model plane.
Aggregates: COUNT(*), SUM/AVG over a column or product of columns,
and +/- arithmetic between aggregates (reference A12/A13).

The exact plane does NOT need this parser for arbitrary SQL — Spark
SQL parses anything — but routing the reference grammar through our
own IR is what lets the model plane answer the same query without
touching data.
"""

from __future__ import annotations

import re

from .query import (
    AggOperation,
    AggregationOperationType,
    AggregationType,
    Condition,
    Query,
    QueryType,
)
from .schema import SchemaGraph

_JOIN_RE = re.compile(r"^(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)$")
_PRED_RE = re.compile(r"^(\w+)\.(\w+)\s*(<=|>=|<>|!=|=|<|>)\s*(.+)$", re.DOTALL)
_BETWEEN_RE = re.compile(
    r"^(\w+)\.(\w+)\s+(NOT\s+)?BETWEEN\s+(.+)\s+AND\s+(.+)$", re.IGNORECASE
)
_IN_RE = re.compile(
    r"^(\w+)\.(\w+)\s+(NOT\s+)?IN\s*\((.+)\)$", re.IGNORECASE | re.DOTALL
)
_NULL_RE = re.compile(r"^(\w+)\.(\w+)\s+IS\s+(NOT\s+)?NULL$", re.IGNORECASE)
_LIKE_RE = re.compile(
    r"^(\w+)\.(\w+)\s+(NOT\s+)?LIKE\s+(.+)$", re.IGNORECASE | re.DOTALL
)
_AGG_RE = re.compile(r"^(SUM|AVG|COUNT)\s*\((.+)\)$", re.IGNORECASE | re.DOTALL)

# cross-column OR groups expand to 2^k - 1 inclusion-exclusion terms
# on the model plane — cap the width
MAX_OR_DISJUNCTS = 4


def _parse_literal(text: str):
    text = text.strip()
    if (text.startswith("'") and text.endswith("'")) or (
        text.startswith('"') and text.endswith('"')
    ):
        return text[1:-1]
    m = re.match(r"^DATE\s+'(.+)'$", text, re.IGNORECASE)
    if m:
        return m.group(1)
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        return text


def _mask_string_literals(s: str) -> str:
    """Same-length copy of ``s`` with the CONTENTS of '...' literals
    replaced by underscores (doubled-quote escapes included), so
    keyword scans and AND-splitting never match inside a literal —
    values like '4-NOT SPECIFIED' or 'ROCK AND ROLL' are data, not
    grammar."""
    out = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        out.append(ch)
        i += 1
        # double-quoted literals mask too: _parse_literal accepts
        # them, so a comma or AND inside "..." is data, not grammar
        if ch == "'" or ch == '"':
            quote = ch
            while i < n:
                if s[i] == quote:
                    if quote == "'" and i + 1 < n and s[i + 1] == "'":
                        out.append("__")  # '' escape
                        i += 2
                        continue
                    out.append(quote)
                    i += 1
                    break
                out.append("_")
                i += 1
    return "".join(out)


def _paren_depth(masked: str) -> list[int]:
    """Prefix paren depth per character position (masked text, so
    parens inside string literals don't count)."""
    depth, out = 0, []
    for ch in masked:
        if ch == "(":
            depth += 1
        out.append(depth)
        if ch == ")":
            depth -= 1
    return out


def _split_conjuncts(
    where: str, masked: str | None = None
) -> list[tuple[str, str]]:
    """Split on AND (outside string literals AND outside parentheses,
    so a ``(a OR b)`` disjunction group stays whole), re-merging the
    AND that belongs to BETWEEN. Returns (raw, masked) pairs so
    callers can pattern-match on the masked text (keywords/operators
    inside literals never trigger) while extracting literal values
    from the raw text."""
    if masked is None:
        masked = _mask_string_literals(where)
    depth = _paren_depth(masked)
    bounds = [0]
    # \bAND\b (not \s+AND\s+): "x = 1 AND(y = 2)" has no space before
    # the paren — the whitespace-anchored split missed it and the
    # greedy literal matcher swallowed "1 AND(y = 2)" as a string
    for m in re.finditer(r"\bAND\b", masked, flags=re.IGNORECASE):
        if depth[m.start()] == 0:
            bounds.extend((m.start(), m.end()))
    bounds.append(len(where))
    parts = [
        (where[a:b].strip(), masked[a:b].strip())
        for a, b in zip(bounds[::2], bounds[1::2])
    ]
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(parts):
        p, pm = parts[i]
        # merge only when the split actually severed a BETWEEN from its
        # AND: the part's LAST BETWEEN has no AND after it (a paren
        # group like "(x BETWEEN 1 AND 5 OR ...)" is complete — its
        # AND was never split away — and must not swallow the next
        # conjunct)
        if (
            re.search(r"\bBETWEEN\b(?!.*\bAND\b)", pm, re.IGNORECASE | re.DOTALL)
            and i + 1 < len(parts)
        ):
            out.append((p + " AND " + parts[i + 1][0], pm + " AND " + parts[i + 1][1]))
            i += 2
        else:
            out.append((p, pm))
            i += 1
    return out


def _resolve(alias_map: dict[str, str], name: str) -> str:
    if name not in alias_map:
        raise ValueError(f"unknown table or alias: {name!r}")
    return alias_map[name]


def _split_top_level(text: str, sep: str) -> list[str]:
    """Split on sep outside parentheses (for the SELECT list)."""
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_operand_product(
    expr: str, alias_map: dict[str, str], default_table: str
) -> list[tuple[str, str]]:
    """``t.a * t.b * ...`` (or bare ``t.a``) -> [(table, col), ...]."""
    operands = []
    multi_table = len(set(alias_map.values())) > 1
    for factor in expr.split("*"):
        factor = factor.strip()
        if "." in factor:
            t, c = factor.split(".", 1)
            operands.append((_resolve(alias_map, t.strip()), c.strip()))
        elif multi_table:
            # binding a bare column to the alphabetically-first table
            # silently mis-routed the MODEL plane (anchor selection is
            # by operand table); the schema graph carries no per-table
            # column lists to resolve ownership, so require the
            # qualifier
            raise ValueError(
                f"unqualified aggregate operand {factor!r} is ambiguous "
                "in a multi-table query; qualify it as table.column"
            )
        else:
            operands.append((default_table, factor))
    return operands


def _parse_select_list(
    select: str, alias_map: dict[str, str], default_table: str, query: Query
) -> None:
    for item in _split_top_level(select, ","):
        alias = None
        m_alias = re.search(r"\s+AS\s+(\w+)\s*$", item, re.IGNORECASE)
        if m_alias:
            alias = m_alias.group(1)
            item = item[: m_alias.start()].strip()
        if _AGG_RE.match(item) is None:
            if re.fullmatch(r"\w+\.\w+", item):
                # bare output column t.c — legal ONLY as a group-by
                # echo; otherwise the query would silently compile to
                # COUNT(*) (pure projections are outside the grammar)
                t, c = item.split(".", 1)
                if (_resolve(alias_map, t), c) not in query.group_bys:
                    raise ValueError(
                        f"bare select column {item!r} is not in GROUP BY "
                        "(projections are outside the grammar)"
                    )
                continue
            raise ValueError(f"cannot parse select item: {item!r}")
        # split aggregate arithmetic: SUM(a) - SUM(b) + SUM(c)
        chunks = re.split(r"\s*([+-])\s*(?=(?:SUM|AVG|COUNT)\s*\()", item, flags=re.IGNORECASE)
        op_type = AggregationOperationType.AGGREGATION
        for chunk in chunks:
            chunk = chunk.strip()
            if chunk == "+":
                op_type = AggregationOperationType.PLUS
                continue
            if chunk == "-":
                op_type = AggregationOperationType.MINUS
                continue
            m = _AGG_RE.match(chunk)
            if not m:
                raise ValueError(f"cannot parse select item: {item!r}")
            agg_type = AggregationType[m.group(1).upper()]
            inner = m.group(2).strip()
            distinct = False
            dm = re.match(r"^DISTINCT\s+(.+)$", inner, re.IGNORECASE | re.DOTALL)
            if dm:
                # COUNT(DISTINCT t.c) — extension; single column only
                # (DISTINCT over products/lists is outside the grammar)
                if agg_type is not AggregationType.COUNT:
                    raise ValueError(
                        f"DISTINCT is only supported inside COUNT: {item!r}"
                    )
                distinct = True
                inner = dm.group(1).strip()
                if "*" in inner or "," in inner:
                    raise ValueError(
                        f"COUNT(DISTINCT ...) takes one column: {item!r}"
                    )
            operands: list[tuple[str, str]] = []
            if not (agg_type is AggregationType.COUNT and inner == "*"):
                operands = _parse_operand_product(inner, alias_map, default_table)
            query.aggregations.append(
                AggOperation(
                    op_type, agg_type, operands, alias=alias, distinct=distinct
                )
            )
            query.query_type = QueryType.AQP
            op_type = AggregationOperationType.AGGREGATION
    # pure COUNT(*) single aggregate => cardinality query (reference
    # A15). COUNT(col) has NULL-skipping semantics and stays AQP.
    aggs = query.aggregations
    if (
        len(aggs) == 1
        and aggs[0].agg_type is AggregationType.COUNT
        and not aggs[0].operands
        and not query.group_bys
    ):
        query.query_type = QueryType.CARDINALITY


def _match_predicate(
    conjunct: str, conj_masked: str, alias_map: dict[str, str]
) -> Condition | None:
    """Match one simple (non-join) predicate: BETWEEN / IN /
    IS [NOT] NULL / comparison. Patterns run on the MASKED text so
    operators or keywords inside string literals never trigger;
    literal values are sliced out of the RAW text by match span
    (same length). Returns None when nothing matches."""
    bm = _BETWEEN_RE.match(conj_masked)
    if bm:
        t, c, neg = bm.group(1), bm.group(2), bm.group(3)
        lo = conjunct[bm.start(4): bm.end(4)]
        hi = conjunct[bm.start(5): bm.end(5)]
        return Condition(
            _resolve(alias_map, t), c,
            "NOT_BETWEEN" if neg else "BETWEEN",
            (_parse_literal(lo), _parse_literal(hi)),
        )
    im = _IN_RE.match(conj_masked)
    if im:
        t, c, neg = im.group(1), im.group(2), im.group(3)
        vals = conjunct[im.start(4): im.end(4)]
        vm = _mask_string_literals(vals)
        cuts = [0] + [i for i, ch in enumerate(vm) if ch == ","] + [len(vals)]
        items = [
            vals[a + (1 if a else 0) : b].strip()
            for a, b in zip(cuts, cuts[1:])
        ]
        return Condition(
            _resolve(alias_map, t), c,
            "NOT_IN" if neg else "IN",
            [_parse_literal(v) for v in items],
        )
    nm = _NULL_RE.match(conj_masked)
    if nm:
        t, c, notnull = nm.groups()
        return Condition(
            _resolve(alias_map, t), c,
            "IS_NOT_NULL" if notnull else "IS_NULL",
        )
    lm = _LIKE_RE.match(conj_masked)
    if lm:
        t, c, neg = lm.group(1), lm.group(2), lm.group(3)
        pat = _parse_literal(conjunct[lm.start(4): lm.end(4)])
        if not isinstance(pat, str):
            raise ValueError(f"LIKE pattern must be a string literal: {conjunct!r}")
        return Condition(
            _resolve(alias_map, t), c,
            "NOT_LIKE" if neg else "LIKE",
            pat,
        )
    pm = _PRED_RE.match(conj_masked)
    if pm:
        t, c, op = pm.group(1), pm.group(2), pm.group(3)
        val = conjunct[pm.start(4): pm.end(4)]
        masked_val = conj_masked[pm.start(4): pm.end(4)].strip()
        # a bare table.column on the RHS is a join-shaped predicate
        # reaching the literal matcher (possible only inside
        # disjunction groups — the conjunct path matches joins first);
        # parsing it as the string 't2.b' would silently match nothing
        if (
            re.fullmatch(r"\w+\.\w+", masked_val)
            and not masked_val[0].isdigit()
        ):
            raise ValueError(
                f"join predicates are not allowed here: {conjunct!r}"
            )
        if op == "!=":
            op = "<>"
        return Condition(_resolve(alias_map, t), c, op, _parse_literal(val))
    return None


def _parse_or_group(
    conjunct: str, conj_masked: str, alias_map: dict[str, str]
) -> Condition:
    """Parse a parenthesized disjunction group
    ``(t.c op v OR t.c BETWEEN a AND b OR ...)`` into
    Condition(..., "OR", [sub-conditions]) — a grammar extension
    beyond the reference's conjunctive-only fragment (SURVEY.md §2
    table E). The exact plane compiles every group to an or-filter
    (pushed into the scan when one table owns all disjuncts, applied
    post-join otherwise). The model plane answers SAME-column groups
    as one range union (spn/ranges.py::union_ranges) and CROSS-column
    groups via inclusion-exclusion over at most MAX_OR_DISJUNCTS
    disjuncts (SPNEnsemble)."""
    inner_raw = conjunct[1:-1].strip()
    inner_masked = conj_masked[1:-1].strip()
    depth = _paren_depth(inner_masked)
    bounds = [0]
    for m in re.finditer(r"\bOR\b", inner_masked, flags=re.IGNORECASE):
        if depth[m.start()] == 0:
            bounds.extend((m.start(), m.end()))
    bounds.append(len(inner_raw))
    subs: list[Condition] = []
    for a, b in zip(bounds[::2], bounds[1::2]):
        raw, msk = inner_raw[a:b].strip(), inner_masked[a:b].strip()
        # a disjunct containing a top-level AND beyond the single AND
        # a BETWEEN owns is a nested conjunction — outside the
        # grammar. Counting (not just testing) closes the bypass
        # where the GREEDY _BETWEEN_RE matched the whole malformed
        # "x BETWEEN 1 AND 5 AND y = 2" and the guard never fired.
        n_ands = len(re.findall(r"\bAND\b", msk, re.IGNORECASE))
        allowed = 1 if _BETWEEN_RE.match(msk) else 0
        if n_ands > allowed:
            raise ValueError(
                f"conjunctions inside disjunction groups are outside "
                f"the grammar: {raw!r}"
            )
        cond = _match_predicate(raw, msk, alias_map)
        if cond is None:
            raise ValueError(f"cannot parse disjunct: {raw!r}")
        subs.append(cond)
    if len(subs) == 1:
        return subs[0]
    keys = {(c.table, c.column) for c in subs}
    first = subs[0]
    if len(keys) == 1:
        return Condition(first.table, first.column, "OR", subs)
    # cross-column group: table is the shared table (None when the
    # disjuncts span tables — the exact compiler then applies the
    # filter post-join instead of pushing it into one scan); the model
    # plane expands these via inclusion-exclusion (SPNEnsemble)
    if len(subs) > MAX_OR_DISJUNCTS:
        raise ValueError(
            f"cross-column OR groups support at most {MAX_OR_DISJUNCTS} "
            f"disjuncts (got {len(subs)}): inclusion-exclusion terms "
            "grow exponentially"
        )
    tables = {c.table for c in subs}
    table = tables.pop() if len(tables) == 1 else None
    return Condition(table, None, "OR", subs)


def parse_query(sql: str, schema: SchemaGraph) -> Query:
    """(reference: evaluation/utils.py::parse_query). Raises ValueError
    on anything outside the reference grammar."""
    # mask FIRST, then match clauses on the MASKED text and slice the
    # raw text by span: collapsing whitespace or scanning for keywords
    # before masking would corrupt literals ('a  b' -> 'a b') or split
    # at a 'GROUP BY' inside a quoted value
    sql = sql.strip().rstrip(";").strip()
    masked_sql = _mask_string_literals(sql)
    # reject unsupported trailing clauses LOUDLY: without this, the
    # greedy predicate matcher absorbed "... = 1 LIMIT 10" into the
    # literal ('1 LIMIT 10') and the query silently matched no rows
    trailer = re.search(
        r"\b(ORDER\s+BY|LIMIT|OFFSET|UNION|INTERSECT|EXCEPT)\b",
        masked_sql,
        re.IGNORECASE,
    )
    if trailer:
        raise ValueError(
            f"{trailer.group(1).upper()} is outside the IR grammar "
            "(use engine.sql / the exact plane for it)"
        )
    m = re.match(
        r"^SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<from>.+?)"
        r"(?:\s+WHERE\s+(?P<where>.+?))?(?:\s+GROUP\s+BY\s+(?P<group>.+?))?"
        r"(?:\s+HAVING\s+(?P<having>.+?))?$",
        masked_sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"query outside the supported grammar: {sql!r}")

    def _raw(group_name: str) -> str | None:
        if m.group(group_name) is None:
            return None
        return sql[m.start(group_name): m.end(group_name)]

    query = Query()
    alias_map: dict[str, str] = {}
    for entry in _raw("from").split(","):
        toks = entry.strip().split()
        tname = toks[0]
        if tname not in schema.tables:
            raise ValueError(f"table {tname!r} not in schema graph")
        alias_map[tname] = tname
        if len(toks) == 2:
            alias_map[toks[1]] = tname
        elif len(toks) > 2:
            raise ValueError(f"cannot parse FROM entry: {entry!r}")
        query.table_set.add(tname)

    if m.group("group"):
        group_raw = _raw("group")
        for gb in group_raw.split(","):
            t, c = gb.strip().split(".")
            query.add_group_by(_resolve(alias_map, t), c)

    # deterministic owner for unqualified operand columns: set
    # iteration order varies with PYTHONHASHSEED and would make the
    # parsed IR (and model-plane answers) irreproducible across runs
    default_table = sorted(query.table_set)[0]
    _parse_select_list(_raw("select"), alias_map, default_table, query)

    if m.group("having"):
        # HAVING extension (reference grammar has none): conjunctive
        # comparisons on aggregate output ALIASES — `HAVING cnt > 100
        # AND rev <= 5.5`. Aliases keep the predicate unambiguous in
        # the IR without re-parsing aggregate expressions; the exact
        # plane filters after the aggregate, the model plane filters
        # its estimated rows (approximate group membership).
        if not m.group("group"):
            raise ValueError("HAVING requires GROUP BY")
        known = {op.alias for op in query.aggregations if op.alias}
        having_raw = _raw("having")
        for part, part_masked in _split_conjuncts(
            having_raw, _mask_string_literals(having_raw)
        ):
            hm = re.match(
                r"^(\w+)\s*(<=|>=|<>|!=|=|<|>)\s*(.+)$", part_masked, re.DOTALL
            )
            if not hm:
                raise ValueError(f"cannot parse HAVING predicate: {part!r}")
            alias, op = hm.group(1), hm.group(2)
            if alias not in known:
                raise ValueError(
                    f"HAVING references {alias!r}, which is not an "
                    f"aggregate alias in the SELECT list ({sorted(known)})"
                )
            lit = _parse_literal(part[hm.start(3): hm.end(3)])
            if op == "!=":
                op = "<>"
            query.having.append((alias, op, lit))

    if m.group("where"):
        where = _raw("where")
        masked = _mask_string_literals(where)
        # conjunctive grammar (reference A8) + ONE extension: OR is
        # legal only inside a parenthesized same-column group
        # (_parse_or_group). NOT only inside IS NOT NULL (scans run on
        # the literal-masked text so keywords inside string values
        # don't false-trigger)
        depth = _paren_depth(masked)
        for om in re.finditer(r"\bOR\b", masked, re.IGNORECASE):
            if depth[om.start()] == 0:
                raise ValueError(
                    "top-level OR is outside the grammar; disjunctions "
                    "must be parenthesized groups, e.g. "
                    "(t.c < 5 OR t.c > 45)"
                )
        if re.search(
            r"\bNOT\b(?!\s+(?:NULL|IN\b|BETWEEN\b|LIKE\b))",
            masked,
            re.IGNORECASE,
        ):
            raise ValueError(
                "NOT is only supported as IS NOT NULL / NOT IN / "
                "NOT BETWEEN / NOT LIKE"
            )
        def process(conjunct: str, conj_masked: str) -> None:
            # match grammar on the MASKED conjunct (operators/keywords
            # inside literals can't trigger); slice literal values out
            # of the RAW conjunct by match span (same length)
            if conj_masked.startswith("(") and conj_masked.endswith(")"):
                cdepth = _paren_depth(conj_masked)
                # only treat as a group if the outer parens wrap the
                # WHOLE conjunct (depth stays >= 1 until the end)
                if min(cdepth[:-1] or [1]) >= 1:
                    inner_raw = conjunct[1:-1].strip()
                    inner_masked = conj_masked[1:-1].strip()
                    d = _paren_depth(inner_masked)
                    has_or = any(
                        d[om.start()] == 0
                        for om in re.finditer(
                            r"\bOR\b", inner_masked, re.IGNORECASE
                        )
                    )
                    if has_or:
                        query.add_where_condition(
                            _parse_or_group(conjunct, conj_masked, alias_map)
                        )
                        return
                    # redundant parens around a conjunction (or a
                    # single predicate): recurse into the inner
                    # conjunct list — "(t.a = 1 AND t.b = 2)" must
                    # parse as two conjuncts, never fall through to
                    # the greedy literal matcher
                    for sub, subm in _split_conjuncts(inner_raw, inner_masked):
                        process(sub, subm)
                    return
            jm = _JOIN_RE.match(conj_masked)
            if jm:
                t1, a1, t2, a2 = jm.groups()
                if t1 in alias_map and t2 in alias_map:
                    rel = schema.find_relationship(
                        _resolve(alias_map, t1), a1, _resolve(alias_map, t2), a2
                    )
                    if rel is None:
                        raise ValueError(
                            f"join {conjunct!r} is not a declared FK edge"
                        )
                    query.add_join_condition(rel.identifier)
                    return
                if not (t1[0].isdigit() or t2[0].isdigit()):
                    # col = col with an unknown/typo'd alias: falling
                    # through would silently parse the RHS as a string
                    # literal and match zero rows (digits fall through:
                    # `x = 0.07` is a numeric predicate, not a join)
                    raise ValueError(
                        f"unknown table or alias in join {conjunct!r}"
                    )
            cond = _match_predicate(conjunct, conj_masked, alias_map)
            if cond is None:
                raise ValueError(f"cannot parse predicate: {conjunct!r}")
            query.add_where_condition(cond)

        for conjunct, conj_masked in _split_conjuncts(where, masked):
            process(conjunct, conj_masked)

    if len(query.table_set) > 1 and len(query.relationship_set) < len(query.table_set) - 1:
        raise ValueError("FROM lists multiple tables but joins do not connect them")
    return query
