"""Generate the committed full-schema TPC-H parquet fixture
(fixtures/tpch/).

Synthetic, deterministic (fixed numpy seed), SMALL (~90k rows total)
data over the PUBLIC TPC-H schema — all 8 tables with every column,
including the partsupp table and the lineitem commit/receipt dates,
ship modes and instructions the driver's TPC-H-subset testdata lacks —
so the reference's own TPC-H query texts
(testdata/workloads/tpch/queries/tpch-q*.test, the public benchmark
SQL) run here with DuckDB oracles. This is NOT dbgen output and copies
nothing from the reference: value domains (nation/region names,
segments, priorities, ship modes, part type/container vocabularies,
phone shapes, 1/3 orderless customers) follow the public TPC-H
specification just closely enough that the benchmark queries' literal
predicates select non-empty results.

Run once; the parquet output is committed:

    python3 scripts/gen_tpch_fixture.py
"""

from __future__ import annotations

import os
from datetime import date, timedelta
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "tpch")

SEED = 19920101
rng = np.random.default_rng(SEED)

N_PART = 2000
N_SUPP = 100
N_CUST = 1500
N_ORDERS = 15000
N_PS_PER_PART = 4            # spec: each part has 4 suppliers

# --- public TPC-H domains ------------------------------------------------

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
# spec nation -> region mapping (dbgen's nations.tbl is public)
NATIONS = [
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
            "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
SHIPMODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
SHIPINSTRUCT = ["DELIVER IN PERSON", "COLLECT COD", "NONE",
                "TAKE BACK RETURN"]
TYPE_S1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
TYPE_S2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_S3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
CONTAINER_S1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
CONTAINER_S2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN",
                "DRUM"]
# p_name is five words from the spec's color vocabulary (subset; keeps
# 'green' for q9 and 'forest' for q20 reasonably frequent)
P_WORDS = ["almond", "antique", "aquamarine", "azure", "beige", "bisque",
           "black", "blanched", "blue", "blush", "brown", "burlywood",
           "chartreuse", "chocolate", "coral", "cornflower", "cream",
           "cyan", "dark", "deep", "dim", "dodger", "drab", "firebrick",
           "forest", "frosted", "gainsboro", "ghost", "goldenrod",
           "green", "honeydew", "hot", "indian", "ivory", "khaki",
           "lavender", "lawn", "lemon", "light", "lime", "linen",
           "magenta", "maroon", "medium", "metallic", "midnight",
           "mint", "misty", "moccasin", "navajo"]
DATE_LO = date(1992, 1, 1)
DATE_HI = date(1998, 8, 2)


def jdn(d: date) -> int:
    return d.toordinal()


def _dec(cents, p: int = 15, s: int = 2):
    if isinstance(cents, np.ndarray):
        cents = cents.tolist()
    return pa.array([Decimal(int(c)).scaleb(-s) for c in cents],
                    type=pa.decimal128(p, s))


def _date(ordinals):
    if isinstance(ordinals, np.ndarray):
        ordinals = ordinals.tolist()
    return pa.array([date.fromordinal(int(o)) for o in ordinals],
                    type=pa.date32())


def write(name: str, data: dict) -> None:
    table = pa.table(data)
    os.makedirs(OUT_DIR, exist_ok=True)
    pq.write_table(table, os.path.join(OUT_DIR, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def text(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{P_WORDS[(i * 7) % 50]} {P_WORDS[(i * 13) % 50]}"
            for i in range(n)]


def gen_region_nation() -> None:
    write("region", {
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": REGIONS,
        "r_comment": text("regional ", 5),
    })
    write("nation", {
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": [n for n, _ in NATIONS],
        "n_regionkey": pa.array([r for _, r in NATIONS], pa.int64()),
        "n_comment": text("national ", 25),
    })


def phone(nationkey: int, i: int) -> str:
    cc = 10 + nationkey
    return (f"{cc}-{100 + (i * 37) % 900}-{100 + (i * 53) % 900}-"
            f"{1000 + (i * 71) % 9000}")


def gen_supplier() -> np.ndarray:
    nk = rng.integers(0, 25, N_SUPP)
    comments = text("supplier ", N_SUPP)
    # q16's NOT-IN filter needs complaint suppliers to exist
    for i in range(0, N_SUPP, 17):
        comments[i] = "slow Customer since Complaints piled up"
    bal = rng.integers(-99999, 999999, N_SUPP)
    write("supplier", {
        "s_suppkey": pa.array(range(1, N_SUPP + 1), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, N_SUPP + 1)],
        "s_address": [f"{i} supply street" for i in range(1, N_SUPP + 1)],
        "s_nationkey": pa.array(nk.tolist(), pa.int64()),
        "s_phone": [phone(int(k), i) for i, k in enumerate(nk)],
        "s_acctbal": _dec(bal),
        "s_comment": comments,
    })
    return nk


def gen_customer() -> np.ndarray:
    nk = rng.integers(0, 25, N_CUST)
    bal = rng.integers(-99999, 999999, N_CUST)
    comments = text("customer ", N_CUST)
    write("customer", {
        "c_custkey": pa.array(range(1, N_CUST + 1), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(1, N_CUST + 1)],
        "c_address": [f"{i} main road" for i in range(1, N_CUST + 1)],
        "c_nationkey": pa.array(nk.tolist(), pa.int64()),
        "c_phone": [phone(int(k), i) for i, k in enumerate(nk)],
        "c_acctbal": _dec(bal),
        "c_mktsegment": [SEGMENTS[i % 5] for i in range(N_CUST)],
        "c_comment": comments,
    })
    return nk


def gen_part() -> np.ndarray:
    """Returns retail price cents per part (1-indexed by partkey-1)."""
    w = rng.integers(0, 50, (N_PART, 5))
    names = [" ".join(P_WORDS[j] for j in row) for row in w]
    t1 = rng.integers(0, 6, N_PART)
    t2 = rng.integers(0, 5, N_PART)
    t3 = rng.integers(0, 5, N_PART)
    sizes = rng.integers(1, 51, N_PART)
    brand_m = rng.integers(1, 6, N_PART)
    brand_n = rng.integers(1, 6, N_PART)
    c1 = rng.integers(0, 5, N_PART)
    c2 = rng.integers(0, 8, N_PART)
    # spec retail price formula family: 900 + partkey/10-ish
    price_c = 90000 + (np.arange(1, N_PART + 1) * 100) % 20001
    # anchors:
    #  q2  — parts 10..19: size 15, type *BRASS
    #  q8  — parts 20..24: ECONOMY ANODIZED STEEL
    #  q17 — parts 30..33: Brand#23 / MED BOX
    #  q19 — parts 40..45: the three (brand, container-class) arms
    #  q20 — parts 50..59: name starts 'forest'
    for i in range(9, 19):
        sizes[i], t3[i] = 15, 2
    for i in range(19, 24):
        t1[i], t2[i], t3[i] = 4, 0, 3
    for i in range(29, 33):
        brand_m[i], brand_n[i] = 2, 3
        c1[i], c2[i] = 2, 1                    # MED BOX
    for k, i in enumerate(range(39, 45)):
        arm = k % 3
        brand_m[i], brand_n[i] = [1, 2, 3][arm], [2, 3, 4][arm]
        c1[i] = [0, 2, 1][arm]                 # SM / MED / LG
        c2[i] = [0, 1, 2][arm]                 # CASE / BOX / BAG
        sizes[i] = [3, 8, 12][arm]
    for i in range(49, 59):
        names[i] = "forest " + names[i].split(" ", 1)[1]
    write("part", {
        "p_partkey": pa.array(range(1, N_PART + 1), pa.int64()),
        "p_name": names,
        "p_mfgr": [f"Manufacturer#{1 + i % 5}" for i in range(N_PART)],
        "p_brand": [f"Brand#{m}{n}" for m, n in zip(brand_m, brand_n)],
        "p_type": [f"{TYPE_S1[a]} {TYPE_S2[b]} {TYPE_S3[c]}"
                   for a, b, c in zip(t1, t2, t3)],
        "p_size": pa.array(sizes.tolist(), pa.int32()),
        "p_container": [f"{CONTAINER_S1[a]} {CONTAINER_S2[b]}"
                        for a, b in zip(c1, c2)],
        "p_retailprice": _dec(price_c),
        "p_comment": text("part ", N_PART),
    })
    return price_c


def gen_partsupp(supp_nk: np.ndarray) -> dict:
    """Each part gets 4 distinct suppliers (spec layout: supplier
    (partkey + k*step) mod N). Returns {(partkey, suppkey)} frame."""
    pk = np.repeat(np.arange(1, N_PART + 1), N_PS_PER_PART)
    k = np.tile(np.arange(N_PS_PER_PART), N_PART)
    sk = ((pk - 1 + k * (N_SUPP // N_PS_PER_PART)) % N_SUPP) + 1
    avail = rng.integers(1, 10000, len(pk))
    cost_c = ((pk * 17 + sk * 29) % 99000) + 1000
    # q2 anchor: give the size-15 BRASS parts a EUROPE-nation supplier
    # (nationkey of supplier sk is supp_nk[sk-1]) with the minimal cost
    europe = [s for s in range(1, N_SUPP + 1)
              if NATIONS[supp_nk[s - 1]][1] == 3]
    for i, p in enumerate(range(10, 20)):
        rows = np.flatnonzero(pk == p)
        sk[rows[0]] = europe[i % len(europe)]
        cost_c[rows[0]] = 500                  # the correlated MIN
    write("partsupp", {
        "ps_partkey": pa.array(pk.tolist(), pa.int64()),
        "ps_suppkey": pa.array(sk.tolist(), pa.int64()),
        "ps_availqty": pa.array(avail.tolist(), pa.int32()),
        "ps_supplycost": _dec(cost_c),
        "ps_comment": text("ps ", len(pk)),
    })
    return {"pk": pk, "sk": sk}


def gen_orders_lineitem(price_c: np.ndarray, ps: dict,
                        cust_nk: np.ndarray,
                        supp_nk: np.ndarray) -> None:
    # spec: 1/3 of customers place no orders — draw custkeys from the
    # first 2/3 so q22's orderless-customer anti-join selects rows
    ck = rng.integers(1, (2 * N_CUST) // 3 + 1, N_ORDERS)
    odate = rng.integers(jdn(DATE_LO), jdn(date(1998, 5, 1)), N_ORDERS)
    lines = 1 + np.minimum(rng.geometric(0.35, N_ORDERS), 6)
    comments = text("order ", N_ORDERS)
    for i in range(0, N_ORDERS, 41):           # q13's NOT-LIKE filter
        comments[i] = "was special requests handled slowly"

    # q18 anchor: the first 5 orders carry 7 lines of quantity 50
    # (sum 350 > 300)
    lines[:5] = 7

    idx = np.repeat(np.arange(N_ORDERS), lines)
    n = len(idx)
    ln = np.concatenate([np.arange(1, c + 1) for c in lines])
    # line (partkey, suppkey) comes from a real partsupp row, so q9's
    # partsupp join and q2/q20 correlations always resolve
    psrow = rng.integers(0, len(ps["pk"]), n)
    pk_l = ps["pk"][psrow]
    sk_l = ps["sk"][psrow]
    qty = rng.integers(1, 51, n)
    qty[idx < 5] = 50                          # q18 anchor lines
    extended_c = qty * price_c[pk_l - 1]
    disc = rng.integers(0, 11, n)              # 0.00 .. 0.10
    tax = rng.integers(0, 9, n)                # 0.00 .. 0.08

    ship = odate[idx] + rng.integers(1, 122, n)
    commit = odate[idx] + rng.integers(30, 91, n)
    receipt = ship + rng.integers(1, 31, n)
    mode = rng.integers(0, 7, n)
    instr = rng.integers(0, 4, n)

    # q19 anchor lines: the three arm parts shipped AIR/REG AIR with
    # DELIVER IN PERSON and in-band quantities
    for j, p in enumerate(range(40, 46)):
        rows = np.flatnonzero(pk_l == p)[:3]
        qty[rows] = [4, 14, 24][j % 3]
        mode[rows] = [1, 0][j % 2]
        instr[rows] = 0

    today = jdn(date(1995, 6, 17))
    returnflag = np.where(
        receipt <= today, np.where(rng.random(n) < 0.5, "R", "A"), "N")
    linestatus = np.where(ship > today, "O", "F")

    # order aggregates
    total_c = np.zeros(N_ORDERS, dtype="int64")
    np.add.at(total_c, idx,
              (extended_c * (100 - disc) * (100 + tax)) // 10000)
    all_f = np.ones(N_ORDERS, dtype=bool)
    any_f = np.zeros(N_ORDERS, dtype=bool)
    np.logical_and.at(all_f, idx, linestatus == "F")
    np.logical_or.at(any_f, idx, linestatus == "F")
    status = np.where(all_f, "F", np.where(any_f, "P", "O"))

    write("orders", {
        "o_orderkey": pa.array(range(1, N_ORDERS + 1), pa.int64()),
        "o_custkey": pa.array(ck.tolist(), pa.int64()),
        "o_orderstatus": status.tolist(),
        "o_totalprice": _dec(total_c),
        "o_orderdate": _date(odate),
        "o_orderpriority": [PRIORITIES[i] for i in
                            rng.integers(0, 5, N_ORDERS)],
        "o_clerk": [f"Clerk#{1 + i % 1000:09d}" for i in range(N_ORDERS)],
        "o_shippriority": pa.array([0] * N_ORDERS, pa.int32()),
        "o_comment": comments,
    })
    write("lineitem", {
        "l_orderkey": pa.array((idx + 1).tolist(), pa.int64()),
        "l_partkey": pa.array(pk_l.tolist(), pa.int64()),
        "l_suppkey": pa.array(sk_l.tolist(), pa.int64()),
        "l_linenumber": pa.array(ln.tolist(), pa.int32()),
        "l_quantity": _dec(qty * 100),
        "l_extendedprice": _dec(extended_c),
        "l_discount": _dec(disc, 15, 2),
        "l_tax": _dec(tax, 15, 2),
        "l_returnflag": returnflag.tolist(),
        "l_linestatus": linestatus.tolist(),
        "l_shipdate": _date(ship),
        "l_commitdate": _date(commit),
        "l_receiptdate": _date(receipt),
        "l_shipinstruct": [SHIPINSTRUCT[i] for i in instr],
        "l_shipmode": [SHIPMODES[i] for i in mode],
        "l_comment": text("line ", n),
    })


def main() -> None:
    gen_region_nation()
    supp_nk = gen_supplier()
    cust_nk = gen_customer()
    price_c = gen_part()
    ps = gen_partsupp(supp_nk)
    gen_orders_lineitem(price_c, ps, cust_nk, supp_nk)
    total = sum(
        pq.ParquetFile(os.path.join(OUT_DIR, f)).metadata.num_rows
        for f in os.listdir(OUT_DIR) if f.endswith(".parquet"))
    size = sum(os.path.getsize(os.path.join(OUT_DIR, f))
               for f in os.listdir(OUT_DIR)) / 1e6
    print(f"TOTAL {total} rows, {size:.1f} MB in {OUT_DIR}")


if __name__ == "__main__":
    main()
