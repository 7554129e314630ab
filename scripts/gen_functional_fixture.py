"""Generate the committed `functional` schema parquet fixture
(fixtures/functional/) — the reference's primary test dataset.

The reference's functional-query workload (331 QueryTest files with
inline expected results) runs over a family of small tables — alltypes
(7,300 rows), alltypessmall (100), alltypestiny (8), alltypesagg
(11,000), plus a dozen static CSV-backed tables. To run those test
texts bit-for-bit we regenerate the SAME data:

* The alltypes family is produced by the reference's deterministic
  generator (java/datagenerator/.../TestDataGenerator.java). This
  script re-derives it in Python, including two load-bearing quirks
  that are baked into the reference's expected results:

  1. **Millisecond re-parse.** The generator formats timestamps with
     SimpleDateFormat ``yyyy-MM-dd HH:mm:ss.S`` — the ``S`` field
     prints the millisecond count UNPADDED ("00:02:00.10" for 10 ms) —
     and the text loader then re-parses those digits as a *decimal
     fraction* (".10" = 100 ms). The stored value is therefore
     ``int(digits) * 10^(9-len(digits))`` ns, not the generator's true
     millis; e.g. id=2 is 00:02:00.100, id=4 is 00:04:00.600 (see the
     reference's own expected rows in alltypes_kudu .test files).

  2. **Calendar day-stepping across DST.** The generator runs with the
     America/Los_Angeles default zone and advances with GregorianCalendar
     add(DAY_OF_MONTH, 1), which adds 24 real hours then compensates
     ONCE by the change in UTC offset (wall-clock-preserving, single
     pass, no recheck). Crossing the 2010-03-14 spring-forward this
     lands back on the standard-time side: Mar 14+ wall times print one
     hour EARLIER than naive accumulation — verified against the
     reference's expected rows ``4400,...,2010-03-17 01:40:07.200...``
     and ``4500,...,2010-03-27 03:20:11.700...``.

* Static tables are parsed from the reference's committed CSVs
  (testdata/DimTbl/data.csv etc. — data files, not code) with Impala
  text-table semantics: ``\\N`` is NULL for every type, the empty field
  is NULL for non-string columns and '' for strings.

* alltypesagg carries the schema template's 11th ``day=NULL``
  partition: a copy of every row whose tinyint_col is NULL
  (functional_schema_template.sql, alltypesagg DEPENDENT_LOAD insert).

Run once; output is committed. ``python3 scripts/gen_functional_fixture.py``
"""

from __future__ import annotations

import os
from datetime import date, datetime, timedelta, timezone
from decimal import ROUND_HALF_UP, Decimal
from zoneinfo import ZoneInfo

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures", "functional")
REF_DATA = "/root/reference/testdata"

LA = ZoneInfo("America/Los_Angeles")
UTC = timezone.utc


def _offset(instant: datetime) -> timedelta:
    return instant.astimezone(LA).utcoffset()


def _local_midnight(y: int, m: int, d: int) -> datetime:
    return datetime(y, m, d, tzinfo=LA).astimezone(UTC)


def _add_day(instant: datetime) -> datetime:
    """GregorianCalendar.add(DAY_OF_MONTH, 1): +24h real time, then a
    single compensation by the UTC-offset delta (no recheck)."""
    old = _offset(instant)
    instant = instant + timedelta(days=1)
    return instant - (_offset(instant) - old)


def _next_month(y: int, m: int) -> tuple[int, int]:
    return (y + 1, 1) if m == 12 else (y, m + 1)


def _stored_timestamp(wall: datetime) -> datetime:
    """The value the reference's text loader ends up with: seconds from
    the wall clock, fraction re-parsed from the unpadded ms digits."""
    ms_field = wall.microsecond // 1000
    digits = str(ms_field)
    frac_ns = int(digits) * 10 ** (9 - len(digits))
    return wall.replace(microsecond=0, tzinfo=None) + timedelta(
        microseconds=frac_ns // 1000)


def _gen_partition(rows: list, start: tuple[int, int, int],
                   end_instant: datetime, ints_per_day: int,
                   max_tuples: int, write_nulls: bool, next_id: int,
                   part_vals: tuple) -> int:
    instant = _local_midnight(*start)
    count = 0
    while instant < end_instant and count < max_tuples:
        for int_col in range(ints_per_day):
            if count >= max_tuples:
                break
            wall = instant.astimezone(LA)
            null_int = write_nulls and int_col == 0
            rows.append((
                next_id,
                next_id % 2 == 0,
                None if write_nulls and int_col % 10 == 0 else int_col % 10,
                None if write_nulls and int_col % 100 == 0 else int_col % 100,
                None if null_int else int_col,
                None if null_int else int_col * 10,
                None if null_int else np.float32(1.1 * int_col),
                None if null_int else 10.1 * int_col,
                wall.strftime("%m/%d/%y"),
                str(int_col),
                _stored_timestamp(wall),
            ) + part_vals)
            next_id += 1
            count += 1
            instant += timedelta(minutes=1, milliseconds=10 * int_col)
        instant = _add_day(instant)
    return next_id


_ALLTYPES_FIELDS = [
    ("id", pa.int32()), ("bool_col", pa.bool_()),
    ("tinyint_col", pa.int8()), ("smallint_col", pa.int16()),
    ("int_col", pa.int32()), ("bigint_col", pa.int64()),
    ("float_col", pa.float32()), ("double_col", pa.float64()),
    ("date_string_col", pa.string()), ("string_col", pa.string()),
    ("timestamp_col", pa.timestamp("us")),
]


def _alltypes_schema(part_cols: list[str]) -> pa.Schema:
    return pa.schema(_ALLTYPES_FIELDS
                     + [(c, pa.int32()) for c in part_cols])


def gen_alltypes(num_partitions: int, max_tuples: int) -> list:
    num_years = max(num_partitions // 12 - 1, 1)
    y, m = 2010 - num_years, 1
    rows: list = []
    next_id = 0
    for _ in range(num_partitions):
        ny, nm = _next_month(y, m)
        next_id = _gen_partition(
            rows, (y, m, 1), _local_midnight(ny, nm, 1), 10, max_tuples,
            False, next_id, (y, m))
        y, m = ny, nm
    return rows


def gen_alltypesagg(write_nulls: bool) -> list:
    rows: list = []
    next_id = 0
    for day in range(1, 11):
        next_id = _gen_partition(
            rows, (2010, 1, day), _local_midnight(2010, 1, day + 1),
            1000, 1000, write_nulls, next_id, (2010, 1, day))
    if write_nulls:
        # the template's 11th partition: day=tinyint_col for the
        # tinyint-NULL rows -> day IS NULL copies, ordered by id
        extra = [r[:-1] + (None,) for r in rows if r[2] is None]
        rows.extend(sorted(extra, key=lambda r: r[0]))
    return rows


def _write(name: str, schema: pa.Schema, rows: list) -> None:
    cols = list(zip(*rows)) if rows else [[] for _ in schema.names]
    arrays = [pa.array(list(col), type=f.type)
              for col, f in zip(cols, schema)]
    table = pa.Table.from_arrays(arrays, schema=schema)
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(table, os.path.join(OUT, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


# --- static CSV-backed tables --------------------------------------------

def _records(content: str, escaped: bool) -> list[list[tuple[str, str]]]:
    """Impala delimited-text record scan: '\\n', '\\r' and '\\r\\n'
    all terminate a record (delimited-text-parser.cc); when escaping
    is on, a backslash makes the next byte literal (so delimiters and
    terminators inside fields survive). Returns per-record lists of
    (unescaped value, raw bytes) — the raw form is what the \\N null
    check matches against."""
    recs: list = []
    rec: list = []
    val: list = []
    raw: list = []
    i, n = 0, len(content)

    def end_field() -> None:
        rec.append(("".join(val), "".join(raw)))
        val.clear()
        raw.clear()

    while i < n:
        c = content[i]
        if escaped and c == "\\" and i + 1 < n:
            raw.append(c)
            raw.append(content[i + 1])
            val.append(content[i + 1])
            i += 2
            continue
        if c == ",":
            end_field()
        elif c in ("\n", "\r"):
            if c == "\r" and i + 1 < n and content[i + 1] == "\n":
                i += 1
            end_field()
            recs.append(list(rec))
            rec.clear()
        else:
            val.append(c)
            raw.append(c)
        i += 1
    if val or rec:  # final record without a trailing terminator
        end_field()
        recs.append(list(rec))
    return recs


def _parse_text(path: str, types: list, lenient: bool = False,
                escaped: bool = False, keep_empty_rows: bool = False) -> list:
    """Impala text-table row parse: \\N (raw) is NULL for every type;
    the empty field is NULL for non-strings and '' for strings. There
    is NO quote handling — quotes are data. In lenient mode (the
    scanner's error recovery): missing trailing fields are NULL, extra
    fields are dropped, and an unparseable numeric field is NULL."""
    with open(path, newline="") as f:
        content = f.read()
    rows = []
    for rec in _records(content, escaped):
        if rec == [("", "")] and not keep_empty_rows:
            continue
        fields = list(rec)
        if lenient:
            fields = (fields + [("", "")] * len(types))[:len(types)]
        else:
            assert len(fields) == len(types), (path, rec)
        row = []
        for (v, rawv), typ in zip(fields, types):
            if rawv == "\\N" or (v == "" and typ is not str):
                row.append(None)
            elif typ is date:
                y, m, d = v.split("-")
                row.append(date(int(y), int(m), int(d)))
            else:
                try:
                    row.append(typ(v))
                except (ValueError, ArithmeticError):
                    if not lenient:
                        raise
                    row.append(None)
        rows.append(tuple(row))
    return rows


def _char(val: str | None, n: int) -> str | None:
    """CHAR(n) storage: pad with spaces AND truncate to n (the
    reference's char-value semantics)."""
    return None if val is None else val.ljust(n)[:n]


def _varchar(val: str | None, n: int) -> str | None:
    return None if val is None else val[:n]


def _dec(p: int, sc: int):
    """DECIMAL(p,s) text parse: round to scale, NULL on overflow
    (decimal parse errors in the reference rather than saturating)."""
    q = Decimal(1).scaleb(-sc)

    def conv(v: str) -> Decimal:
        d = Decimal(v).quantize(q, ROUND_HALF_UP)
        if abs(d) >= Decimal(1).scaleb(p - sc):
            raise ValueError(v)
        return d

    return conv


def _dec9(v: str) -> Decimal:
    """DECIMAL(9,0) text parse: round to scale 0, NULL on overflow
    (the scanner's error recovery, exercised via lenient mode)."""
    d = Decimal(v).quantize(Decimal(1), ROUND_HALF_UP)
    if abs(d) >= 10 ** 9:
        raise ValueError(v)
    return d


def main() -> None:
    _write("alltypes", _alltypes_schema(["year", "month"]),
           gen_alltypes(24, 310))
    _write("alltypessmall", _alltypes_schema(["year", "month"]),
           gen_alltypes(4, 25))
    _write("alltypestiny", _alltypes_schema(["year", "month"]),
           gen_alltypes(4, 2))
    _write("alltypesagg", _alltypes_schema(["year", "month", "day"]),
           gen_alltypesagg(True))
    _write("alltypesaggnonulls",
           _alltypes_schema(["year", "month", "day"]),
           gen_alltypesagg(False))
    _write("alltypesnopart", _alltypes_schema([]), [])  # load target

    ids = pa.schema([("id", pa.int64()), ("name", pa.string()),
                     ("zip", pa.int32())])
    _write("dimtbl", ids, _parse_text(f"{REF_DATA}/DimTbl/data.csv",
                                      [int, str, int]))
    _write("testtbl", ids, [])  # created empty; insert target
    _write("jointbl", pa.schema([
        ("test_id", pa.int64()), ("test_name", pa.string()),
        ("test_zip", pa.int32()), ("alltypes_id", pa.int32())]),
        _parse_text(f"{REF_DATA}/JoinTbl/data.csv", [int, str, int, int]))
    _write("tinytable", pa.schema([("a", pa.string()), ("b", pa.string())]),
           _parse_text(f"{REF_DATA}/TinyTable/data.csv", [str, str]))
    _write("tinyinttable", pa.schema([("int_col", pa.int32())]),
           _parse_text(f"{REF_DATA}/TinyIntTable/data.csv", [int]))
    _write("nulltable", pa.schema([
        ("a", pa.string()), ("b", pa.string()), ("c", pa.string()),
        ("d", pa.int32()), ("e", pa.float64()), ("f", pa.string()),
        ("g", pa.string())]),
        _parse_text(f"{REF_DATA}/NullTable/data.csv",
                    [str, str, str, int, float, str, str]))
    _write("nullrows", pa.schema([
        ("id", pa.string()), ("blank", pa.string()),
        ("null_str", pa.string()), ("null_int", pa.int32()),
        ("null_double", pa.float64()), ("group_str", pa.string()),
        ("some_nulls", pa.string()), ("bool_nulls", pa.bool_())]),
        _parse_text(f"{REF_DATA}/NullRows/data.csv",
                    [str, str, str, int, float, str, str,
                     lambda v: v == "true"]))
    _write("liketbl", pa.schema([
        ("str_col", pa.string()), ("match_like_col", pa.string()),
        ("no_match_like_col", pa.string()),
        ("match_regex_col", pa.string()),
        ("no_match_regex_col", pa.string())]),
        _parse_text(f"{REF_DATA}/LikeTbl/data.csv", [str] * 5))
    _write("emptytable", pa.schema([("field", pa.string()),
                                    ("f2", pa.int32())]), [])

    dec = _parse_text(f"{REF_DATA}/data/decimal_tbl.txt",
                      [Decimal] * 5)
    _write("decimal_tbl", pa.schema([
        ("d1", pa.decimal128(9, 0)), ("d2", pa.decimal128(10, 0)),
        ("d3", pa.decimal128(20, 10)), ("d4", pa.decimal128(38, 38)),
        ("d5", pa.decimal128(10, 5)), ("d6", pa.decimal128(9, 0))]),
        [r + (Decimal(1),) for r in dec])

    # decimal_tiny: the generator's double accumulation; BigDecimal
    # .valueOf uses the shortest round-trip repr, exactly Python repr()
    tiny = []
    c1, c2, c3 = 0.0, 100.0, 0.0
    for i in range(100):
        if i % 10 == 0:
            c3 = 0.0
        tiny.append((
            Decimal(repr(c1)).quantize(Decimal("1.0000"), ROUND_HALF_UP),
            Decimal(repr(c2)).quantize(Decimal("1.00000"), ROUND_HALF_UP),
            Decimal(repr(c3)).quantize(Decimal("0.1"), ROUND_HALF_UP)))
        c1 += 0.1111
        c2 += 1.22222
        c3 += 0.1
    _write("decimal_tiny", pa.schema([
        ("c1", pa.decimal128(10, 4)), ("c2", pa.decimal128(15, 5)),
        ("c3", pa.decimal128(1, 1))]), tiny)

    parts = ["0001-01-01", "1399-06-27", "2017-11-27", "9999-12-31"]
    drows = []
    for i, part in enumerate(parts):
        y, m, d = (int(x) for x in part.split("-"))
        for r in _parse_text(f"{REF_DATA}/data/date_tbl/{i:04d}.txt",
                             [int, date]):
            drows.append(r + (date(y, m, d),))
    _write("date_tbl", pa.schema([
        ("id_col", pa.int32()), ("date_col", pa.date32()),
        ("date_part", pa.date32())]), drows)

    chars = _parse_text(f"{REF_DATA}/data/chars-tiny.txt", [str, str, str])
    _write("chars_tiny", pa.schema([
        ("cs", pa.string()), ("cl", pa.string()), ("vc", pa.string())]),
        [(_char(a, 5), _char(b, 140), _varchar(c, 32))
         for a, b, c in chars])

    # chars_formats: same (cs CHAR(5), cl CHAR(140), vc VARCHAR(32))
    # shape (load-dependent-tables.sql), loaded from chars-formats.txt
    cf = _parse_text(f"{REF_DATA}/data/chars-formats.txt", [str, str, str])
    _write("chars_formats", pa.schema([
        ("cs", pa.string()), ("cl", pa.string()), ("vc", pa.string())]),
        [(_char(a, 5), _char(b, 140), _varchar(c, 32)) for a, b, c in cf])

    # Semi/anti-join fixtures created inline by the reference's
    # test_join_queries.py::__load_semi_join_tables
    ab = pa.schema([("a", pa.int32()), ("b", pa.int32()),
                    ("c", pa.int32())])
    _write("semijointbla", ab, [
        (1, 1, 1), (1, 1, 10), (1, 2, 10), (1, 3, 10),
        (None, None, 30), (2, 4, 30), (2, None, 20)])
    _write("semijointblb", ab, [
        (1, 1, 1), (1, 1, 10), (1, 2, 5), (1, None, 10),
        (2, 10, None), (3, None, None), (3, None, 50)])

    _write("nullescapedtable", pa.schema([
        ("a", pa.string()), ("b", pa.string()), ("c", pa.string()),
        ("d", pa.int32()), ("e", pa.float64()), ("f", pa.string()),
        ("g", pa.string())]),
        _parse_text(f"{REF_DATA}/NullTable/data.csv",
                    [str, str, str, int, float, str, str], escaped=True))

    _write("tblwithraggedcolumns", pa.schema([
        ("str_col", pa.string()), ("int_col", pa.int32())]),
        _parse_text(f"{REF_DATA}/TblWithRaggedColumns/data.csv",
                    [str, int], lenient=True, escaped=True,
                    keep_empty_rows=True))

    _write("unsupported_types", pa.schema([
        ("int_col", pa.int32()), ("dec_col", pa.decimal128(10, 0)),
        ("date_col", pa.date32()), ("str_col", pa.string()),
        ("bin_col", pa.binary()), ("bigint_col", pa.int64())]),
        [(r[0], r[1], r[2], r[3],
          r[4].encode() if r[4] is not None else None, r[5])
         for r in _parse_text(f"{REF_DATA}/UnsupportedTypes/data.csv",
                              [int, _dec9, date, str, str, int],
                              lenient=True)])

    # manynulls: derived from alltypesagg by the schema template's LOAD
    # insert — nullcol = NULL when (id div 500) is even
    agg = gen_alltypesagg(True)
    _write("manynulls", pa.schema([("id", pa.int32()),
                                   ("nullcol", pa.int32())]),
           [(r[0], None if (r[0] // 500) % 2 == 0 else r[0])
            for r in agg])

    # overflow: boundary-value literals (testdata/data/overflow.txt).
    # The text scanner SATURATES integer overflow (strtol clamps to the
    # type bounds) and reads float overflow as ±inf — the expected rows
    # in overflow.test record exactly that. Decimal overflow errors in
    # the reference; those columns load as NULL and no test selects
    # them.
    def _sat(bits):
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        return lambda v: min(max(int(v), lo), hi)

    _write("overflow", pa.schema([
        ("tinyint_col", pa.int8()), ("smallint_col", pa.int16()),
        ("int_col", pa.int32()), ("bigint_col", pa.int64()),
        ("float_col", pa.float32()), ("double_col", pa.float64()),
        ("decimal0_col", pa.decimal128(13, 4)),
        ("decimal1_col", pa.decimal128(38, 0)),
        ("decimal2_col", pa.decimal128(38, 38))]),
        _parse_text(f"{REF_DATA}/data/overflow.txt",
                    [_sat(8), _sat(16), _sat(32), _sat(64),
                     lambda v: np.float32(float(v)), float,
                     _dec(13, 4), _dec(38, 0), _dec(38, 38)], escaped=True,
                    lenient=True))

    # alltypes_date_partition: derived from alltypes (template LOAD):
    # ids < 500, date_col = ts date (+5 days for odd ids)
    at = gen_alltypes(24, 310)
    adp_rows = []
    for r in at:
        if r[0] >= 500:
            continue
        base = r[10].date()
        dcol = base if r[0] % 2 == 0 else base + timedelta(days=5)
        adp_rows.append((r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7],
                         r[9], r[10], dcol))
    _write("alltypes_date_partition", pa.schema([
        ("id", pa.int32()), ("bool_col", pa.bool_()),
        ("tinyint_col", pa.int8()), ("smallint_col", pa.int16()),
        ("int_col", pa.int32()), ("bigint_col", pa.int64()),
        ("float_col", pa.float32()), ("double_col", pa.float64()),
        ("string_col", pa.string()), ("timestamp_col", pa.timestamp("us")),
        ("date_col", pa.date32())]), adp_rows)

    # chars_medium: derived from alltypesagg (schema template LOAD
    # insert): CHAR(8)/CHAR(3) pad-truncate, VARCHAR(3) truncate
    _write("chars_medium", pa.schema([
        ("id", pa.int32()), ("date_char_col", pa.string()),
        ("char_col", pa.string()), ("date_varchar_col", pa.string()),
        ("varchar_col", pa.string())]),
        [(r[0], _char(r[8], 8),
          _char(r[9], 3) if r[0] % 3 in (0, 1) else None,
          _varchar(r[8], 8),
          _varchar(r[9], 3) if r[0] % 3 == 0 else None)
         for r in agg])

    _write("strings_with_quotes", pa.schema([
        ("s", pa.string()), ("i", pa.int32())]),
        _parse_text(f"{REF_DATA}/data/strings_with_quotes.csv",
                    [str, int], escaped=True))

    # part_strings_with_quotes: 4 single-row partition inserts
    # (template LOAD section); partition values unescape to " ' \" \'
    _write("part_strings_with_quotes", pa.schema([
        ("i", pa.int32()), ("p", pa.string())]),
        [(1, '"'), (2, "'"), (3, '\\"'), (4, "\\'")])

    # greptiny: single string column, default (\x01) delimiters — each
    # line is the whole field
    with open(f"{REF_DATA}/hive_benchmark/grepTiny/part-00000",
              newline="") as f:
        grep_rows = [(ln,) for ln in f.read().split("\n") if ln != ""]
    _write("greptiny", pa.schema([("field", pa.string())]), grep_rows)

    zips = _parse_text(
        f"{REF_DATA}/ImpalaDemoDataset/DEC_00_SF3_P077_with_ann_noheader.csv",
        [str, str, str, str, int], lenient=True)
    _write("zipcode_incomes", pa.schema([
        ("id", pa.string()), ("zip", pa.string()),
        ("description1", pa.string()), ("description2", pa.string()),
        ("income", pa.int32())]), zips)


if __name__ == "__main__":
    main()
