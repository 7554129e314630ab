"""Impala nested-collection path references on Spark.

The reference lets a FROM clause reference collections by path
(fe/.../analysis/CollectionTableRef.java, Path.java; executed by
SubplanNode + UnnestNode, be/src/exec/subplan-node.cc):

    select item from complextypestbl.int_array            -- table-level
    select a.item from complextypestbl t, t.int_array a   -- correlated
    select key, value from complextypestbl t, t.int_map m -- maps
    from t, t.nested_struct.c.d d1, d1.item i1            -- chained
    from t, (select count(item) c from t.int_array) v     -- relative
                                                          -- subquery

Spark has the same engine capabilities under different spellings —
LATERAL VIEW [OUTER] posexplode for unnest, LATERAL correlated
subqueries for the subplan form — so this module rewrites the path
syntax schema-aware (the collection-vs-map decision and struct-field
casing need the resolved type, exactly as the reference resolves paths
during analysis):

* correlated item `t.path a`  -> `LATERAL VIEW posexplode(t.path) a AS
  pos, item` (maps: `explode(...) a AS key, value`), replacing the
  comma-join — INNER semantics: rows with empty/NULL collections drop,
  like the reference's inner subplan. LEFT [OUTER] JOIN variants emit
  `LATERAL VIEW OUTER`.
* table-level item `tbl.path a` -> `tbl _tN LATERAL VIEW ...`.
* mid-path collections flatten through hidden lateral views with
  unambiguous `_pN/_iN` output names.
* a FROM-subquery whose items resolve against an outer alias becomes a
  Spark `LATERAL (...)` subquery; a relative item inside it (no base
  relation to attach to) becomes a generator-derived table
  `(select posexplode(outer.path) as (pos, item)) alias`.

Plans stay fully declarative: every rewrite lands on Generate /
LateralJoin operators that Catalyst optimizes like hand-written
LATERAL VIEW SQL — nothing is collected or evaluated in Python.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

_IDENT = r"[A-Za-z_][A-Za-z_0-9]*"
_PATH_ITEM = re.compile(
    rf"^\s*({_IDENT}(?:\.{_IDENT})+)(?:\s+(?:as\s+)?({_IDENT}))?\s*$",
    re.IGNORECASE)
_TABLE_ITEM = re.compile(
    rf"^\s*({_IDENT})(?:\s+(?:as\s+)?({_IDENT}))?\s*$", re.IGNORECASE)
# a joined table with an ON condition: register the alias, leave text
_TABLE_ON_ITEM = re.compile(
    rf"^\s*({_IDENT})(?:\s+(?:as\s+)?({_IDENT}))?\s+on\s+.+$",
    re.IGNORECASE | re.DOTALL)
_FROM_END = re.compile(
    r"\b(where|group|having|order|limit|offset|union|intersect|except|"
    r"minus|window)\b", re.IGNORECASE)
_JOINER = re.compile(
    r",|\b(?:(left|right|full|cross|inner)\s+)?(?:(outer|anti|semi)\s+)?"
    r"join\b", re.IGNORECASE)


class _Env(dict):
    """alias(lower) -> column dict {name(lower): (actual, DataType)}"""


def _cols(dtype) -> dict:
    if isinstance(dtype, StructType):
        return {f.name.lower(): (f.name, f.dataType) for f in dtype.fields}
    return {}


def _lv_cols(dtype) -> dict:
    from pyspark.sql.types import IntegerType, StringType
    if isinstance(dtype, ArrayType):
        out = {"pos": ("pos", IntegerType()),
               "item": ("item", dtype.elementType)}
        # the reference exposes a struct element's fields directly on
        # the collection alias (i.e. `arr.f` == `arr.item.f`)
        if isinstance(dtype.elementType, StructType):
            for f in dtype.elementType.fields:
                out.setdefault(f.name.lower(), (f.name, f.dataType))
        return out
    return {"key": ("key", dtype.keyType if isinstance(dtype, MapType)
                    else StringType()),
            "value": ("value", dtype.valueType
                      if isinstance(dtype, MapType) else StringType())}


class _Scope:
    def __init__(self, spark: SparkSession, outer: "_Scope | None"):
        self.spark = spark
        self.outer = outer
        self.env: _Env = _Env()
        self.used_outer = False
        self.n = 0
        # emptiness predicates pending WHERE injection (semi/anti
        # joins against a relative collection path become row-local
        # size() checks — no join, no shuffle)
        self.pending_preds: list[str] = []
        # table-backed aliases of THIS scope and hoisted path columns
        # (struct-descent exprs precomputed on the base relation so a
        # correlated aggregate only references a plain column — Spark's
        # DecorrelateInnerQuery rejects struct-typed outer refs)
        self.table_items: dict = {}
        self.hoists: dict = {}
        self.ctx = outer.ctx if outer is not None else {
            "markers": {}, "n": 0}

    def lookup(self, alias: str):
        a = alias.lower()
        if a in self.env:
            return self.env[a], False
        s = self.outer
        while s is not None:
            if a in s.env:
                return s.env[a], True
            s = s.outer
        return None, False

    def owning_scope(self, alias: str):
        a = alias.lower()
        s = self
        while s is not None:
            if a in s.env:
                return s
            s = s.outer
        return None

    def request_hoist(self, alias: str, suffix: str) -> str:
        byalias = self.hoists.setdefault(alias.lower(), {})
        key = suffix.lower()
        if key not in byalias:
            self.n += 1
            byalias[key] = (suffix, f"_nph{self.n}")
        return byalias[key][1]

    def table_schema(self, name: str):
        try:
            return self.spark.table(name).schema
        except Exception:
            return None

    def fresh(self, prefix: str) -> str:
        self.n += 1
        return f"{prefix}{self.n}"


def _collect_steps(root_expr: str, root_cols: dict, segs: list[str]):
    """Walk `segs` from a column dict, returning the explode chain:
    ([(dtype, expr)], ok). Each step's expr references `@` as the
    previous step's element placeholder (substituted at emission)."""
    steps: list[tuple] = []
    expr, cur_t, cur_cols = root_expr, None, root_cols
    i = 0
    while i < len(segs):
        seg = segs[i].lower()
        if cur_cols is None or seg not in cur_cols:
            return steps, None
        actual, cur_t = cur_cols[seg]
        expr = f"{expr}.{actual}" if expr else actual
        cur_cols = _cols(cur_t) or None
        i += 1
        if isinstance(cur_t, (ArrayType, MapType)) and i < len(segs):
            nxt = segs[i].lower()
            steps.append((cur_t, expr))
            if isinstance(cur_t, ArrayType):
                if nxt == "item":
                    expr, cur_t = "@item", cur_t.elementType
                    i += 1
                elif isinstance(cur_t.elementType, StructType) and \
                        nxt in {f.name.lower()
                                for f in cur_t.elementType.fields}:
                    # implicit element hop: the reference's
                    # `customer.c_orders.o_lineitems` unnests c_orders
                    # and descends into the element struct without an
                    # `item` segment (Path.java LegalPathType)
                    expr, cur_t = "@item", cur_t.elementType
                else:
                    return steps, None
            else:
                if nxt not in ("key", "value"):
                    return steps, None
                expr = "@key" if nxt == "key" else "@value"
                cur_t = (cur_t.keyType if nxt == "key"
                         else cur_t.valueType)
                i += 1
            cur_cols = _cols(cur_t) or None
    if not isinstance(cur_t, (ArrayType, MapType)):
        return steps, None
    steps.append((cur_t, expr))
    return steps, cur_t


def _gen_call(dtype, expr: str) -> tuple[str, str, str]:
    """(generator call, out-names tuple, select list) for a step."""
    if isinstance(dtype, ArrayType):
        return f"posexplode({expr})", "(pos, item)", "pos, item"
    return f"explode({expr})", "(key, value)", "key, value"


def _build_relation(scope: "_Scope", steps: list, final_t,
                    alias: str, base_table: str | None) -> str:
    """Compose the explode chain into one self-contained relation:

      (select F.pos, F.item
       from <base|generator-derived> [hidden LATERAL VIEWs] ...) alias

    Single-relation-plus-lateral-views inside the subquery keeps to
    Spark's FROM grammar; the whole thing composes freely with commas
    and joins outside."""
    names = (("pos", "item") if isinstance(final_t, ArrayType)
             else ("key", "value"))
    # the reference exposes struct-element fields on the alias itself
    extras = []
    if isinstance(final_t, ArrayType) and isinstance(
            final_t.elementType, StructType):
        extras = [f.name for f in final_t.elementType.fields
                  if f.name.lower() not in ("pos", "item")]
    if base_table is None and len(steps) == 1:
        call, outs, _ = _gen_call(*steps[0])
        if not extras:
            return f"(select {call} as {outs}) {alias}"
        sel = ", ".join(names) + ", " + ", ".join(
            f"item.{f} as {f}" for f in extras)
        return f"(select {sel} from (select {call} as {outs})) {alias}"
    parts = []
    prev_alias = None
    if base_table is not None:
        bt = scope.fresh("_npt")
        parts.append(f"{base_table} {bt}")
        # step exprs are rooted at the hidden base alias
        steps = [(d, e.replace("@base", bt)) for d, e in steps]
    for k, (dtype, expr) in enumerate(steps):
        if prev_alias is not None:
            expr = expr.replace("@item", f"{prev_alias}_i")                        .replace("@key", f"{prev_alias}_k")                        .replace("@value", f"{prev_alias}_v")
        last = k == len(steps) - 1
        g = scope.fresh("_npg")
        if k == 0 and base_table is None:
            call, _, _ = _gen_call(dtype, expr)
            if isinstance(dtype, ArrayType):
                parts.append(f"(select {call} as ({g}_p, {g}_i))")
            else:
                parts.append(f"(select {call} as ({g}_k, {g}_v))")
        else:
            call, _, _ = _gen_call(dtype, expr)
            if last:
                parts.append(f"LATERAL VIEW {call} {g} AS "
                             + ", ".join(names))
                prev_alias = g
                continue
            if isinstance(dtype, ArrayType):
                parts.append(f"LATERAL VIEW {call} {g} AS {g}_p, {g}_i")
            else:
                parts.append(f"LATERAL VIEW {call} {g} AS {g}_k, {g}_v")
        prev_alias = g
    sel = ", ".join(f"{prev_alias}.{n}" for n in names)
    if extras:
        sel += ", " + ", ".join(
            f"{prev_alias}.item.{f} as {f}" for f in extras)
    return f"(select {sel} from " + " ".join(parts) + f") {alias}"


def _build_lateral_chain(scope: "_Scope", steps: list, final_t,
                         alias: str) -> list[str]:
    """Alias-rooted (correlated) chains become SIBLING lateral
    relations — `LATERAL (select posexplode(x) as (_p1,_i1)) _g1 ,
    LATERAL (select explode(_g1._i1) as (key,value)) a` — because
    Spark's decorrelation accepts a correlated collection reference at
    the top select of a lateral subquery but not nested one level
    deeper (probed: array-of-map chains). Intermediate outputs use
    hidden names so bare pos/item stay unambiguous."""
    extras = []
    if isinstance(final_t, ArrayType) and isinstance(
            final_t.elementType, StructType):
        extras = [f.name for f in final_t.elementType.fields
                  if f.name.lower() not in ("pos", "item")]
    rels = []
    prev = None
    for k, (dtype, expr) in enumerate(steps):
        if prev is not None:
            expr = (expr.replace("@item", f"{prev}_i")
                        .replace("@key", f"{prev}_k")
                        .replace("@value", f"{prev}_v"))
        last = k == len(steps) - 1
        if last:
            call, outs, names = _gen_call(dtype, expr)
            if extras:
                sel = names + ", " + ", ".join(
                    f"item.{f} as {f}" for f in extras)
                rels.append(f"(select {sel} from "
                            f"(select {call} as {outs})) {alias}")
            else:
                rels.append(f"(select {call} as {outs}) {alias}")
        else:
            g = scope.fresh("_npl")
            if isinstance(dtype, ArrayType):
                rels.append(f"(select posexplode({expr}) "
                            f"as ({g}_p, {g}_i)) {g}")
            else:
                rels.append(f"(select explode({expr}) "
                            f"as ({g}_k, {g}_v)) {g}")
            prev = g
    return rels


def _split_from_items(text: str) -> list[tuple[str, str]]:
    """[(joiner_text, item_text)] — joiner '' for the first item."""
    items, cur, joiner, depth, i, n = [], [], "", 0, 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            j = i + 1
            while j < n and text[j] != "'":
                j += 1
            cur.append(text[i:j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if depth == 0:
            m = _JOINER.match(text, i)
            if m and not (text[i] not in "," and i > 0
                          and (text[i - 1].isalnum() or text[i - 1] == "_")):
                items.append((joiner, "".join(cur)))
                cur, joiner = [], m.group(0)
                i = m.end()
                continue
        cur.append(c)
        i += 1
    items.append((joiner, "".join(cur)))
    return items


def _find_from_clauses(sql: str) -> list[tuple[int, int]]:
    """(start, end) spans of top-level FROM item lists (after the FROM
    keyword up to the clause terminator)."""
    spans, i, n = [], 0, len(sql)
    depth = 0
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
        elif c == "`":
            # backtick-quoted identifiers may spell keywords
            # (``m.`from``` in a select list is not the FROM clause)
            i += 1
            while i < n and sql[i] != "`":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and sql[i:i + 4].lower() == "from" \
                and (i == 0 or not (sql[i - 1].isalnum()
                                    or sql[i - 1] == "_")) \
                and (i + 4 == n or not (sql[i + 4].isalnum()
                                        or sql[i + 4] == "_")):
            j, d2 = i + 4, 0
            while j < n:
                cj = sql[j]
                if cj == "'":
                    j += 1
                    while j < n and sql[j] != "'":
                        j += 1
                elif cj == "`":
                    j += 1
                    while j < n and sql[j] != "`":
                        j += 1
                elif cj == "(":
                    d2 += 1
                elif cj == ")":
                    if d2 == 0:
                        break
                    d2 -= 1
                elif d2 == 0:
                    m = _FROM_END.match(sql, j)
                    if m and not (sql[j - 1].isalnum() or sql[j - 1] == "_"):
                        break
                j += 1
            spans.append((i + 4, j))
            i = j
            continue
        i += 1
    return spans


def _rewrite_scope(scope: _Scope, sql: str) -> str:
    spans = _find_from_clauses(sql)
    if not spans:
        return _rewrite_subselects(scope, sql)
    out, prev = [], 0
    for (s, e) in spans:
        out.append(_rewrite_subselects(scope, sql[prev:s]))
        scope.pending_preds = []
        out.append(_rewrite_from_list(scope, sql[s:e]))
        prev = e
        if scope.pending_preds:
            pred = " and ".join(scope.pending_preds)
            m = re.match(r"\s*where\b", sql[prev:], re.IGNORECASE)
            if m:
                out.append(sql[prev:prev + m.end()] + " " + pred + " and ")
                prev += m.end()
            else:
                out.append(" where " + pred + " ")
            scope.pending_preds = []
    out.append(_rewrite_subselects(scope, sql[prev:]))
    return "".join(out)


def _rewrite_subselects(scope: _Scope, text: str) -> str:
    """Recurse into parenthesized SELECTs outside FROM clauses
    (scalar/EXISTS subqueries may carry relative refs too)."""
    out, i, n = [], 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            j = i + 1
            while j < n and text[j] != "'":
                j += 1
            out.append(text[i:j + 1])
            i = j + 1
            continue
        if c == "(":
            depth, j = 0, i
            while j < n:
                if text[j] == "'":
                    j += 1
                    while j < n and text[j] != "'":
                        j += 1
                elif text[j] == "(":
                    depth += 1
                elif text[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            inner = text[i + 1:j]
            if re.match(r"\s*select\b", inner, re.IGNORECASE):
                sub = _Scope(scope.spark, scope)
                out.append("(" + _rewrite_scope(sub, inner) + ")")
                if sub.used_outer:
                    scope.used_outer = True
            else:
                out.append("(" + _rewrite_subselects(scope, inner) + ")")
            i = j + 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _rewrite_from_list(scope: _Scope, text: str) -> str:
    items = _split_from_items(text)
    out = []
    for joiner, item in items:
        rewritten, joiner_out = _rewrite_item(scope, item, joiner)
        out.append(joiner_out)
        out.append(rewritten)
    return "".join(out)


def _rewrite_item(scope: _Scope, item: str, joiner: str) -> tuple[str, str]:
    """Returns (rewritten item text, joiner text to emit)."""
    stripped = item.strip()
    outer_join = bool(re.search(r"\b(left|full|outer)\b", joiner,
                                re.IGNORECASE))
    if stripped.startswith("("):
        depth, j = 0, 0
        while j < len(stripped):
            if stripped[j] == "(":
                depth += 1
            elif stripped[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        inner, tail = stripped[1:j], stripped[j + 1:]
        sub = _Scope(scope.spark, scope)
        new_inner = _rewrite_scope(sub, inner)
        lead = " LATERAL " if sub.used_outer else " "
        alias = re.sub(r"(?i)^\s*as\s+", "", tail).strip()
        if alias:
            scope.env[alias.lower()] = {}
        return f"{lead}({new_inner}){tail} ", joiner

    m = _TABLE_ITEM.match(stripped)
    if m:
        name, alias = m.group(1), m.group(2) or m.group(1)
        schema = scope.table_schema(name)
        if schema is None:
            return item, joiner
        scope.env[alias.lower()] = _cols(schema)
        scope.table_items[alias.lower()] = name
        ctx = scope.ctx
        ctx["n"] += 1
        marker = f"\x01NPH{ctx['n']}\x01"
        ctx["markers"][marker] = (scope, alias.lower(), name, item)
        return marker, joiner

    m = _TABLE_ON_ITEM.match(stripped)
    if m and m.group(1).lower() not in ("select",):
        name, alias = m.group(1), m.group(2) or m.group(1)
        schema = scope.table_schema(name)
        if schema is not None:
            scope.env[alias.lower()] = _cols(schema)
            scope.table_items[alias.lower()] = name
        return item, joiner

    m = _PATH_ITEM.match(stripped)
    if not m:
        return item, joiner
    path, alias = m.group(1), m.group(2)
    segs = path.split(".")
    head = segs[0]
    alias = alias or segs[-1]

    entry, from_outer = scope.lookup(head)
    if entry is not None:
        steps, final_t = _collect_steps(head, entry, segs[1:])
        if final_t is None:
            return item, joiner
        # `c LEFT SEMI/ANTI JOIN c.c_orders` tests only the collection's
        # emptiness — a row-local predicate, not a join (the reference
        # plans it as a SubplanNode with a nested-loop semi/anti over
        # the in-row collection; a real join would shuffle the full
        # nested column as a key). Single-segment relative paths only.
        anti_semi = re.search(r"\b(anti|semi)\b", joiner, re.IGNORECASE)
        if (anti_semi and len(segs) == 2 and not from_outer
                and re.search(r"\bleft\b", joiner, re.IGNORECASE)):
            if anti_semi.group(1).lower() == "anti":
                pred = f"({path} is null or size({path}) = 0)"
            else:
                pred = f"(size({path}) > 0)"
            scope.pending_preds.append(pred)
            return "", " "
        if from_outer:
            scope.used_outer = True
        d0, e0 = steps[0]
        if e0.lower().startswith(head.lower() + ".") \
                and (e0.count(".") >= 2 or len(steps) > 1):
            owning = scope.owning_scope(head)
            if owning is not None \
                    and head.lower() in owning.table_items:
                hname = owning.request_hoist(head, e0[len(head) + 1:])
                steps[0] = (d0, f"{head}.{hname}")
        rels = _build_lateral_chain(scope, steps, final_t, alias)
        scope.env[alias.lower()] = _lv_cols(final_t)
        # an alias-rooted relation is correlated -> Spark LATERAL;
        # LEFT/OUTER joins keep collection-less rows (subplan OUTER)
        if outer_join:
            # single-step ARRAY outer: explode a NULL-padded array via
            # an INNER lateral instead of OUTER JOIN LATERAL — Spark
            # decorrelates the latter into a SortMergeJoin KEYED ON THE
            # WHOLE NESTED ARRAY (shuffles every byte of the collection
            # column twice); the padded form stays a single Generate
            # with nested-field pruning intact. pos is re-NULLed on
            # padded rows (a genuine null element keeps its position).
            if (len(steps) == 1 and isinstance(final_t, ArrayType)
                    and not re.search(r"\bfull\b", joiner, re.IGNORECASE)):
                arr = steps[0][1]
                el_ddl = final_t.elementType.simpleString()
                empty = f"({arr} is null or size({arr}) = 0)"
                sel = [f"case when {empty} then cast(null as int) "
                       f"else pos end as pos", "item"]
                if isinstance(final_t.elementType, StructType):
                    sel += [f"item.{f.name} as {f.name}"
                            for f in final_t.elementType.fields
                            if f.name.lower() not in ("pos", "item")]
                rel = (f"(select {', '.join(sel)} from (select "
                       f"posexplode(if({empty}, array(cast(null as "
                       f"{el_ddl})), {arr})) as (pos, item))) {alias}")
                return f" LATERAL {rel} ", " , "
            if len(rels) == 1:
                # map-typed correlated refs are rejected by Spark's
                # DecorrelateInnerQuery inside OUTER JOIN LATERAL
                # (UNSUPPORTED_CORRELATED_REFERENCE_DATA_TYPE);
                # LATERAL VIEW OUTER expresses the same keep-empty
                # semantics without a correlated subquery
                if isinstance(final_t, MapType):
                    mlv = re.match(
                        r"\(select (\w+\([^()]*(?:\([^()]*\)[^()]*)*\))"
                        r" as \(([^)]*)\)\) (\w+)$", rels[0])
                    if mlv:
                        return (f" LATERAL VIEW OUTER {mlv.group(1)} "
                                f"{mlv.group(3)} AS {mlv.group(2)} ",
                                " ")
                return f" LATERAL {rels[0]} ON true ", " LEFT OUTER JOIN "
            joined = " , LATERAL ".join(rels[:-1])
            return (f" LATERAL {joined} LEFT OUTER JOIN LATERAL "
                    f"{rels[-1]} ON true ", joiner)
        return " LATERAL " + " , LATERAL ".join(rels) + " ", joiner

    schema = scope.table_schema(head)
    if schema is None:
        return item, joiner
    steps, final_t = _collect_steps("@base", _cols(schema), segs[1:])
    if final_t is None:
        return item, joiner
    rel = _build_relation(scope, steps, final_t, alias, head)
    scope.env[alias.lower()] = _lv_cols(final_t)
    if outer_join:
        return f" {rel} ON true ", " LEFT OUTER JOIN "
    return f" {rel} ", joiner


# a dotted token directly after FROM/JOIN, or a comma-joined dotted
# item (possibly aliased) ending at a clause boundary — may
# over-match select lists, in which case the rewriter is a no-op
_PATH_HINT = re.compile(
    rf"\b(?:from|join)\s+{_IDENT}(?:\.{_IDENT})+"
    rf"|,\s*{_IDENT}(?:\.{_IDENT})+(?:\s+(?:as\s+)?{_IDENT})?\s*"
    r"(?=,|$|\)|\bjoin\b|\bwhere\b|\bgroup\b|\border\b|\blimit\b|"
    r"\bleft\b|\bright\b|\bfull\b|\binner\b|\bcross\b|\bunion\b)",
    re.IGNORECASE)


def rewrite_collection_refs(spark: SparkSession, sql: str) -> str:
    """Entry point: no-op unless the statement might carry a dotted
    FROM item (fast pre-filter keeps other queries untouched)."""
    if not _PATH_HINT.search(sql):
        return sql
    root = _Scope(spark, None)
    out = _rewrite_scope(root, sql)
    for marker, (sc, alias, name, original) in root.ctx["markers"].items():
        hoists = sc.hoists.get(alias)
        if hoists:
            exprs = ", ".join(f"{alias}.{suf} as {hn}"
                              for suf, hn in hoists.values())
            repl = f" (select {alias}.*, {exprs} from {name} {alias}) {alias} "
        else:
            repl = original
        out = out.replace(marker, repl)
    return out
