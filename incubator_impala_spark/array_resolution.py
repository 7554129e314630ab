"""PARQUET_ARRAY_RESOLUTION semantics — resolving a table's logical
array-of-struct column against a parquet file's PHYSICAL list encoding
(2-level vs 3-level), by position or by name.

The reference resolves every materialized path independently against
the file's schema tree (be/src/exec/parquet/parquet-metadata-utils.cc,
ParquetSchemaResolver::ResolvePath; IMPALA-4725), so an index-based
policy that mismatches the file's actual encoding returns WRONG data
deterministically — which parquet-ambiguous-list-{modern,legacy}.test
pins down. Rules reproduced here:

- THREE_LEVEL: the element node is the repeated group's first child.
- TWO_LEVEL: the element node is the repeated group itself.
- TWO_LEVEL_THEN_THREE_LEVEL: each path tries 2-level; if it does not
  land on an existing leaf (missing field OR group-where-leaf
  mismatch), it retries 3-level.
- POSITION fallback matches struct fields by ordinal, NAME by
  case-insensitive name. A path that walks off the schema resolves to
  NULL; a path ending on a group is incompatible (surfaced as NULL
  here — the reference raises, but only CATCH blocks observe that).

Spark-side the plan stays columnar and element-local: the file is read
once under Spark's (correct) decoding, and the logical schema is an
expression-only `transform(arr, x -> named_struct(...))` whose leaves
are the resolved physical paths — no Python in the row path, identical
cost at any scale to reading the column directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class _Node:
    def __init__(self, name: str):
        self.name = name
        self.children: list[_Node] = []
        self.leaf = True

    def child(self, name: str) -> "_Node":
        for c in self.children:
            if c.name == name:
                return c
        c = _Node(name)
        self.children.append(c)
        self.leaf = False
        return c


def _physical_tree(path: str) -> _Node:
    """Schema tree of the array column, reconstructed from the footer's
    column paths (driver-side metadata read only)."""
    import pyarrow.parquet as pq

    root = _Node("<root>")
    schema = pq.ParquetFile(path).schema
    for i in range(len(schema)):
        node = root
        for seg in schema.column(i).path.split("."):
            node = node.child(seg)
    return root


def _resolve(elem: _Node, path: list[str], indexes: list[int],
             by_name: bool) -> list[str] | None:
    """Element-relative physical segments for one logical leaf path,
    or None (missing / incompatible)."""
    node, out = elem, []
    for seg, idx in zip(path, indexes):
        if node.leaf:
            return None
        if by_name:
            nxt = next((c for c in node.children
                        if c.name.lower() == seg.lower()), None)
        else:
            nxt = node.children[idx] if idx < len(node.children) \
                else None
        if nxt is None:
            return None
        out.append(nxt.name)
        node = nxt
    return out if node.leaf else None


def resolve_array_view(spark: SparkSession, location: str,
                       array_col: str, elem_fields: list[tuple],
                       fallback: str, array_res: str) -> DataFrame:
    """DataFrame with `array_col` presented under the logical element
    schema `elem_fields` ([(name, type, subfields-or-None)]), resolved
    per the current option pair."""
    from pyspark.sql import functions as F

    tree = _physical_tree(location)
    arr_node = None
    if fallback == "name":
        arr_node = next((c for c in tree.children
                         if c.name.lower() == array_col.lower()), None)
    elif tree.children:
        arr_node = tree.children[0]
    df = spark.read.parquet(location)
    if arr_node is None or arr_node.leaf or not arr_node.children:
        return df.select(F.lit(None).cast(
            _elem_ddl(array_col, elem_fields)).alias(array_col))
    repeated = arr_node.children[0]
    # is the FILE 2- or 3-level? compare Spark's decoded element fields
    # with the repeated node's children vs its first child's children
    spark_elem = df.schema[df.schema.names[
        [n.lower() for n in df.schema.names].index(array_col.lower())
        if array_col.lower() in [n.lower() for n in df.schema.names]
        else 0]].dataType.elementType
    spark_names = {f.name for f in spark_elem.fields} \
        if hasattr(spark_elem, "fields") else set()
    file_three_level = (
        not repeated.leaf and len(repeated.children) == 1
        and {c.name for c in repeated.children[0].children}
        == spark_names)

    def leaf_paths(fields, prefix, idx_prefix):
        for i, (name, typ, sub) in enumerate(fields):
            if sub:
                yield from leaf_paths(sub, prefix + [name],
                                      idx_prefix + [i])
            else:
                yield prefix + [name], idx_prefix + [i], typ

    by_name = fallback == "name"

    def resolve_leaf(path, idxs):
        def attempt(mode):
            elem = repeated if mode == "two" else (
                repeated.children[0] if repeated.children else None)
            if elem is None:
                return None
            segs = _resolve(elem, path, idxs, by_name)
            if segs is None:
                return None
            return ([repeated.children[0].name] if mode == "three"
                    else []) + segs
        if array_res == "two_level":
            return attempt("two")
        if array_res == "three_level":
            return attempt("three")
        return attempt("two") or attempt("three")

    def spark_path(segs):
        # map a repeated-node-relative physical path onto Spark's
        # decoded element
        if file_three_level:
            inner = repeated.children[0].name
            if segs and segs[0] == inner:
                return segs[1:]
            return None  # resolved into the wrapper itself
        return segs

    def build(fields, x, path, idxs):
        parts = []
        for i, (name, typ, sub) in enumerate(fields):
            if sub:
                parts.append(build(sub, x, path + [name],
                                   idxs + [i]).alias(name))
            else:
                segs = resolve_leaf(path + [name], idxs + [i])
                sp = spark_path(segs) if segs else None
                if sp is None:
                    parts.append(F.lit(None).cast(typ).alias(name))
                else:
                    e = x
                    for s in sp:
                        e = e[s]
                    parts.append(e.cast(typ).alias(name))
        return F.struct(*parts)

    phys_col = next(
        (n for n in df.schema.names
         if n.lower() == array_col.lower()), df.schema.names[0])
    out = df.select(F.transform(
        F.col(f"`{phys_col}`"),
        lambda x: build(elem_fields, x, [], [])).alias(array_col))
    return out


def _elem_ddl(array_col: str, elem_fields) -> str:
    def one(fields):
        items = []
        for name, typ, sub in fields:
            items.append(f"{name}:{one(sub)}" if sub
                         else f"{name}:{typ}")
        return "struct<" + ",".join(items) + ">"
    return f"array<{one(elem_fields)}>"
