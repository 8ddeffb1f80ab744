"""Second OLAP shape family: the TPC-H Q8/Q9/Q12/Q19/Q21 patterns plus two
event-stream operators (ordered path aggregation, grouped mode), each a
distinct distributed pattern and each DuckDB-hash-verified by the driver gate.

Shared machinery: `_orderkey_join_sums` — the q3/q7 co-partition shape
generalized. A dim side (one row per orderkey carrying a small int payload)
and a fact side (rows carrying a small int group code + a float measure)
union into ONE sort by orderkey; per-block vectorized run scans reduce
interior runs to packed (fact_code << 20 | dim_value) partial sums, and the
first/last run of each block (<= 2 orderkeys) merges on the driver — the
O(blocks)-carry contract every sorted-scan operator in this repo follows.

Reference semantics mirrored (citations into /root/reference):
the reference exposes no OLAP surface of its own (it proxies Meilisearch,
`src/search_proxy/services/search_proxy_service.py:119-265`); these shapes
exist because the north rule requires explicit partition/shuffle/skew
handling for the analytical side of a 100-TB corpus engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Sum

from ..sources.documents import read_parquet_clean
from .simple_text import _doc_path

SQL: dict[str, str] = {}

_DIMV_BITS = 20
_DIMV_MASK = (1 << _DIMV_BITS) - 1


# ------------------------------------------------------------------ shared

def _dimfact_reduce(k, side, dimv, factf, vol, skip_edge: bool,
                    bits: int = _DIMV_BITS):
    """Vectorized per-run join+reduce over arrays sorted by orderkey `k`.

    Each run (one orderkey) holds at most one dim row (side=1, payload
    `dimv`) and any number of fact rows (side=0, group code `factf`,
    measure `vol`). Returns packed partial keys
    (factf << 20 | dimv) and per-key measure sums; runs without a dim row
    contribute nothing (inner-join semantics). With `skip_edge` the first
    and last runs are excluded — the caller merges them across blocks."""
    empty = (np.empty(0, np.int64), np.empty(0, np.float64))
    if k.size == 0:
        return empty
    new = np.r_[True, k[1:] != k[:-1]]
    rid = np.cumsum(new) - 1
    nruns = rid[-1] + 1
    dim = side == 1
    dv = np.zeros(nruns, np.int64)
    dv[rid[dim]] = dimv[dim].astype(np.int64) + 1  # +1: 0 == "no dim row"
    keep = (~dim) & (dv[rid] > 0)
    if skip_edge:
        keep &= (rid != 0) & (rid != nruns - 1)
    if not keep.any():
        return empty
    key = ((factf[keep].astype(np.int64) << bits)
           | (dv[rid[keep]] - 1))
    u, inv = np.unique(key, return_inverse=True)
    return u, np.bincount(inv, weights=vol[keep])


def _union_schema(n: int, orderkey, side_val: int, dimv, factf, vol):
    return pa.table({
        "orderkey": pa.array(orderkey, pa.int64()),
        "side": pa.array(np.full(n, side_val, np.int8)),
        "dimv": pa.array(dimv, pa.int32()),
        "factf": pa.array(factf, pa.int64()),
        "vol": pa.array(vol, pa.float64()),
    })


def _okjoin_arrays(t: pa.Table):
    return (t["orderkey"].to_numpy(zero_copy_only=False),
            t["side"].to_numpy(zero_copy_only=False),
            t["dimv"].to_numpy(zero_copy_only=False),
            t["factf"].to_numpy(zero_copy_only=False),
            t["vol"].to_numpy(zero_copy_only=False))


def _orderkey_join_sums(dim_ds, fact_ds):
    """Union + ONE sort(orderkey) + per-block run reduce + bounded driver
    edge merge. Both inputs must carry the `_union_schema` columns. Returns
    (factf: int64[], dimv: int64[], sums: float64[]).

    Carry contract: the <= 2 edge runs per block ship RAW, so per-carry
    size is O(rows per orderkey) — bounded by the schema here (an order
    has single-digit lineitems). A caller whose key can be a corpus-scale
    hub must use the constant-carry profile design instead
    (stages/graph.py pagerank)."""

    def block_reduce(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "partial": pa.array([], pa.bool_()),
            "orderkey": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "dimv": pa.array([], pa.int32()),
            "factf": pa.array([], pa.int64()),
            "vol": pa.array([], pa.float64()),
            "pkey": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        k, side, dimv, factf, vol = _okjoin_arrays(batch)
        u, sums = _dimfact_reduce(k, side, dimv, factf, vol, skip_edge=True)
        new = np.r_[True, k[1:] != k[:-1]]
        rid = np.cumsum(new) - 1
        edge = (rid == 0) | (rid == rid[-1])
        raw = batch.filter(pa.array(edge))
        inter = pa.table({
            "partial": pa.array(np.zeros(u.size, bool)),
            "orderkey": pa.array(np.zeros(u.size, np.int64)),
            "side": pa.array(np.full(u.size, -1, np.int8)),
            "dimv": pa.array(np.zeros(u.size, np.int32)),
            "factf": pa.array(np.zeros(u.size, np.int64)),
            "vol": pa.array(sums, pa.float64()),
            "pkey": pa.array(u, pa.int64())})
        rawt = pa.table({
            "partial": pa.array(np.ones(raw.num_rows, bool)),
            "orderkey": raw["orderkey"],
            "side": raw["side"],
            "dimv": raw["dimv"],
            "factf": raw["factf"],
            "vol": raw["vol"],
            "pkey": pa.array(np.zeros(raw.num_rows, np.int64))})
        return pa.concat_tables([inter, rawt])

    seg = (dim_ds.union(fact_ds).sort("orderkey")
           .map_batches(block_reduce, batch_format="pyarrow",
                        batch_size=None))

    keys: list[np.ndarray] = []
    vols: list[np.ndarray] = []
    bound: list[pa.Table] = []
    for b in seg.iter_batches(batch_format="pyarrow"):
        it = b.filter(pc.invert(b["partial"]))
        keys.append(it["pkey"].to_numpy(zero_copy_only=False))
        vols.append(it["vol"].to_numpy(zero_copy_only=False))
        bb = b.filter(b["partial"])
        if bb.num_rows:
            bound.append(bb)
    if bound:  # <= 2 orderkey runs per block: bounded driver merge
        bt = pa.concat_tables(bound)
        k, side, dimv, factf, vol = _okjoin_arrays(bt)
        order = np.argsort(k, kind="stable")
        u, sums = _dimfact_reduce(k[order], side[order], dimv[order],
                                  factf[order], vol[order], skip_edge=False)
        keys.append(u)
        vols.append(sums)
    allk = np.concatenate(keys) if keys else np.empty(0, np.int64)
    allv = np.concatenate(vols) if vols else np.empty(0)
    u, inv = np.unique(allk, return_inverse=True)
    sums = np.bincount(inv, weights=allv) if u.size else np.empty(0)
    return (u >> _DIMV_BITS), (u & _DIMV_MASK), sums


def _sorted_key_array(ds, col: str) -> np.ndarray:
    """Collect one int64 key column of a (small, already-filtered) Dataset
    into a sorted numpy membership array."""
    parts = [b[col].to_numpy(zero_copy_only=False)
             for b in ds.iter_batches(batch_format="pyarrow",
                                      batch_size=65536)]
    return np.sort(np.concatenate(parts).astype(np.int64)) if parts \
        else np.empty(0, np.int64)


def _member(keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Sorted-membership test (the broadcast-probe idiom)."""
    if keys.size == 0:
        return np.zeros(len(vals), bool)
    pos = np.searchsorted(keys, vals)
    pos = np.minimum(pos, keys.size - 1)
    return keys[pos] == vals


def _rev_e4(t: pa.Table) -> np.ndarray:
    """Revenue in exact integer 'basis points': price and discount are
    2-dp decimals, so round(price*100) * (100 - round(disc*100)) is an
    EXACT integer (x 1e4 the float revenue). Integer-valued float64 sums
    below 2^53 are associative, so distributed sums become independent of
    block layout — the q17 integral-sum convention, adopted here after a
    2-dp rounding-boundary flake (the SQL oracle computes the same form).
    """
    p = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100)
    d = np.rint(t["l_discount"].to_numpy(zero_copy_only=False) * 100)
    return p * (100.0 - d)


# ------------------------------------------ Q8: national market share

Q8_REGION = "ASIA"
Q8_NATION = "NATION_2"
Q8_PTYPE = "PROMO"
Q8_LO, Q8_HI = "1995-01-01", "1997-01-01"


def market_share(sf_dir: str, region: str = Q8_REGION,
                 nation: str = Q8_NATION, ptype: str = Q8_PTYPE) -> pa.Table:
    """Q8 — TPC-H Q8 shape: one nation's share of a region's yearly revenue
    for one part type (a grouped ratio over a 7-table join).

    Scale shape: every dimension folds to the minimum broadcast state —
    region+nation+customer collapse to a sorted custkey membership array,
    part to a sorted promo-partkey array, supplier to a (suppkey -> nation
    code) probe. Orders shrink to keys-only (orderkey, year) dim rows and
    lineitem to (orderkey, supp-nation, revenue) fact rows, mutually
    semi-filtered so the ONE co-partition sort moves rows proportional to
    the match count. The driver computes per-year ratios from
    O(nations x years) packed sums."""
    import datetime

    from ..stages.runs import semi_id_filter

    lo = datetime.datetime.fromisoformat(Q8_LO)
    hi = datetime.datetime.fromisoformat(Q8_HI)

    nat = read_parquet_clean(
        _doc_path(sf_dir, "nation"),
        columns=["n_nationkey", "n_name", "n_regionkey"]).take_all()
    reg = read_parquet_clean(
        _doc_path(sf_dir, "region"), columns=["r_regionkey", "r_name"],
        filter=pc.field("r_name") == region).take_all()
    region_keys = {int(r["r_regionkey"]) for r in reg}
    region_nks = [int(r["n_nationkey"]) for r in nat
                  if int(r["n_regionkey"]) in region_keys]
    target_code = next(int(r["n_nationkey"]) for r in nat
                       if r["n_name"] == nation)

    cust_keys = _sorted_key_array(read_parquet_clean(
        _doc_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"],
        filter=pc.field("c_nationkey").isin(region_nks)), "c_custkey")
    part_keys = _sorted_key_array(read_parquet_clean(
        _doc_path(sf_dir, "part"), columns=["p_partkey", "p_type"],
        filter=pc.field("p_type") == ptype), "p_partkey")
    supp = read_parquet_clean(
        _doc_path(sf_dir, "supplier"),
        columns=["s_suppkey", "s_nationkey"]).take_all()
    supp.sort(key=lambda r: int(r["s_suppkey"]))
    sk = np.array([int(r["s_suppkey"]) for r in supp], np.int64)
    sn = np.array([int(r["s_nationkey"]) for r in supp], np.int64)
    cust_ref, part_ref, supp_ref = (ray.put(cust_keys), ray.put(part_keys),
                                    ray.put((sk, sn)))

    def orders_side(batch: pa.Table) -> pa.Table:
        keys = ray.get(cust_ref)
        t = batch.filter(pa.array(_member(
            keys, batch["o_custkey"].to_numpy(zero_copy_only=False))))
        n = t.num_rows
        return _union_schema(
            n, t["o_orderkey"].cast(pa.int64()), 1,
            pc.year(t["o_orderdate"]).cast(pa.int32()),
            np.zeros(n, np.int64), np.zeros(n))

    def lineitem_side(batch: pa.Table) -> pa.Table:
        pkeys = ray.get(part_ref)
        skeys, scodes = ray.get(supp_ref)
        t = batch.filter(pa.array(_member(
            pkeys, batch["l_partkey"].to_numpy(zero_copy_only=False))))
        sup = t["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, sup)
        pos = np.minimum(pos, max(skeys.size - 1, 0))
        rev = _rev_e4(t)  # exact integer sums: ratio is layout-independent
        n = t.num_rows
        return _union_schema(n, t["l_orderkey"].cast(pa.int64()), 0,
                             np.zeros(n, np.int32), scodes[pos], rev)

    orders = read_parquet_clean(
        _doc_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo)
        & (pc.field("o_orderdate") < hi),
    ).map_batches(orders_side, batch_format="pyarrow",
                  batch_size=65536).materialize()
    lines = read_parquet_clean(
        _doc_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    ).map_batches(lineitem_side, batch_format="pyarrow", batch_size=65536)
    lines = semi_id_filter(lines, orders, id_col="orderkey").materialize()
    orders = semi_id_filter(orders, lines, id_col="orderkey")

    ncode, year, sums = _orderkey_join_sums(orders, lines)
    years = np.unique(year)
    out_y, out_s = [], []
    for y in years:
        tot = sums[year == y].sum()
        tgt = sums[(year == y) & (ncode == target_code)].sum()
        out_y.append(int(y))
        out_s.append(round(float(tgt / tot), 6) if tot else None)
    return pa.table({"o_year": pa.array(out_y, pa.int32()),
                     "mkt_share": pa.array(out_s, pa.float64())})


SQL["q8_market_share"] = f"""
SELECT CAST(o_year AS INTEGER) AS o_year,
       round(sum(CASE WHEN nation = '{Q8_NATION}' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             round(l_extendedprice * 100)
               * (100 - round(l_discount * 100)) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = '{Q8_REGION}' AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '{Q8_LO}'
        AND o_orderdate < TIMESTAMP '{Q8_HI}'
        AND p_type = '{Q8_PTYPE}')
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------- Q9: profit by nation and year

Q9_PART_LIKE = "widget"


def profit_by_nation(sf_dir: str, name_sub: str = Q9_PART_LIKE) -> pa.Table:
    """Q9 — TPC-H Q9 shape (adapted: the synthetic schema has no partsupp,
    so profit is revenue): per (supplier nation, order year) revenue over
    parts whose name contains a substring.

    Scale shape: same co-partition machinery as Q8, but the dim side
    (orders) carries NO selective predicate of its own — it is semi-filtered
    by the fact side's surviving orderkeys before the sort, the sideways
    information passing that keeps the exchange proportional to matches."""
    from ..stages.runs import semi_id_filter

    nat = read_parquet_clean(
        _doc_path(sf_dir, "nation"),
        columns=["n_nationkey", "n_name"]).take_all()
    name_of = {int(r["n_nationkey"]): r["n_name"] for r in nat}

    part_keys = _sorted_key_array(read_parquet_clean(
        _doc_path(sf_dir, "part"), columns=["p_partkey", "p_name"],
        filter=pc.match_substring(pc.field("p_name"), name_sub)), "p_partkey")
    supp = read_parquet_clean(
        _doc_path(sf_dir, "supplier"),
        columns=["s_suppkey", "s_nationkey"]).take_all()
    supp.sort(key=lambda r: int(r["s_suppkey"]))
    sk = np.array([int(r["s_suppkey"]) for r in supp], np.int64)
    sn = np.array([int(r["s_nationkey"]) for r in supp], np.int64)
    part_ref, supp_ref = ray.put(part_keys), ray.put((sk, sn))

    def lineitem_side(batch: pa.Table) -> pa.Table:
        pkeys = ray.get(part_ref)
        skeys, scodes = ray.get(supp_ref)
        t = batch.filter(pa.array(_member(
            pkeys, batch["l_partkey"].to_numpy(zero_copy_only=False))))
        sup = t["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, sup)
        pos = np.minimum(pos, max(skeys.size - 1, 0))
        rev = _rev_e4(t)
        n = t.num_rows
        return _union_schema(n, t["l_orderkey"].cast(pa.int64()), 0,
                             np.zeros(n, np.int32), scodes[pos], rev)

    def orders_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _union_schema(
            n, batch["o_orderkey"].cast(pa.int64()), 1,
            pc.year(batch["o_orderdate"]).cast(pa.int32()),
            np.zeros(n, np.int64), np.zeros(n))

    lines = read_parquet_clean(
        _doc_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    ).map_batches(lineitem_side, batch_format="pyarrow",
                  batch_size=65536).materialize()
    orders = semi_id_filter(
        read_parquet_clean(
            _doc_path(sf_dir, "orders"),
            columns=["o_orderkey", "o_orderdate"],
        ).map_batches(orders_side, batch_format="pyarrow", batch_size=65536),
        lines, id_col="orderkey")

    ncode, year, sums = _orderkey_join_sums(orders, lines)
    rows = sorted(zip((name_of[int(c)] for c in ncode), year.tolist(),
                      np.round(sums / 1e4, 2).tolist()))
    return pa.table({
        "nation": pa.array([r[0] for r in rows], pa.string()),
        "o_year": pa.array([r[1] for r in rows], pa.int32()),
        "sum_profit": pa.array([r[2] for r in rows], pa.float64()),
    })


SQL["q9_profit_by_nation"] = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       round(sum(round(l_extendedprice * 100)
                 * (100 - round(l_discount * 100))) / 10000.0, 2)
           AS sum_profit
FROM part, supplier, lineitem, orders, nation
WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%{Q9_PART_LIKE}%'
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ------------------------------- Q12: conditional counts by line status

Q12_YEAR = "1997"
_HIGH_PRIOS = ("1-URGENT", "2-HIGH")


def priority_by_status(sf_dir: str) -> pa.Table:
    """Q12 — TPC-H Q12 shape (adapted: the synthetic lineitem has no
    shipmode/commitdate, so the group key is l_linestatus): per line
    status, how many of one year's lineitems belong to high- vs
    low-priority orders (conditional aggregation after a fact-dim join).

    Scale shape: the orders dim folds to one BIT per orderkey (is_high),
    semi-filtered to the year's orderkeys before the one co-partition
    sort; counts pack into (status_code << 20 | is_high) partials."""
    import datetime

    from ..stages.runs import semi_id_filter

    lo = datetime.datetime.fromisoformat(f"{Q12_YEAR}-01-01")
    hi = datetime.datetime.fromisoformat(f"{int(Q12_YEAR) + 1}-01-01")
    status_codes = {"F": 0, "O": 1}

    status_values = pa.array(sorted(status_codes,
                                    key=status_codes.__getitem__))

    def lineitem_side(batch: pa.Table) -> pa.Table:
        codes = pc.index_in(batch["l_linestatus"],
                            value_set=status_values).cast(pa.int64())
        if codes.null_count:  # fail fast, not as a NaN cast crash later
            seen = set(pc.unique(batch["l_linestatus"]).to_pylist())
            raise ValueError(
                f"priority_by_status: unexpected l_linestatus value(s) "
                f"{sorted(seen - set(status_codes))!r}; known codes are "
                f"{sorted(status_codes)!r}")
        n = batch.num_rows
        return _union_schema(
            n, batch["l_orderkey"].cast(pa.int64()), 0,
            np.zeros(n, np.int32),
            codes.to_numpy(zero_copy_only=False), np.ones(n))

    def orders_side(batch: pa.Table) -> pa.Table:
        is_high = pc.is_in(batch["o_orderpriority"],
                           value_set=pa.array(list(_HIGH_PRIOS)))
        n = batch.num_rows
        return _union_schema(
            n, batch["o_orderkey"].cast(pa.int64()),
            1, is_high.cast(pa.int32()).to_numpy(zero_copy_only=False),
            np.zeros(n, np.int64), np.zeros(n))

    lines = read_parquet_clean(
        _doc_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    ).map_batches(lineitem_side, batch_format="pyarrow",
                  batch_size=65536).materialize()
    orders = semi_id_filter(
        read_parquet_clean(
            _doc_path(sf_dir, "orders"),
            columns=["o_orderkey", "o_orderpriority"],
        ).map_batches(orders_side, batch_format="pyarrow", batch_size=65536),
        lines, id_col="orderkey")

    scode, is_high, sums = _orderkey_join_sums(orders, lines)
    code_name = {v: k for k, v in status_codes.items()}
    out = {}
    for c, h, s in zip(scode, is_high, sums):
        hi_c, lo_c = out.setdefault(code_name[int(c)], [0, 0])
        if h:
            out[code_name[int(c)]][0] = hi_c + int(round(s))
        else:
            out[code_name[int(c)]][1] = lo_c + int(round(s))
    names = sorted(out)
    return pa.table({
        "l_linestatus": pa.array(names, pa.string()),
        "high_line_count": pa.array([out[n][0] for n in names], pa.int64()),
        "low_line_count": pa.array([out[n][1] for n in names], pa.int64()),
    })


SQL["q12_priority_by_status"] = f"""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_YEAR}-01-01'
  AND l_shipdate < TIMESTAMP '{int(Q12_YEAR) + 1}-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ------------------------------ Q19: disjunctive-predicate revenue scan

Q19_CLASSES = (  # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#1", 1, 10, 1, 20),
    ("Brand#2", 11, 30, 10, 40),
    ("Brand#3", 21, 50, 20, 50),
)


def disjunctive_revenue(sf_dir: str) -> pa.Table:
    """Q19 — TPC-H Q19 shape (adapted to available columns): revenue over
    an OR of three (brand, size-range, quantity-range) conjunct classes.

    Scale shape: disjunctions defeat parquet row-group pruning, so the
    pattern is membership pushdown instead — the part dim folds to one
    sorted partkey array PER CLASS (brand+size applied at the dim read),
    and each lineitem batch evaluates the OR as three vectorized
    membership+range tests. One float partial per block leaves the scan."""
    class_keys = []
    for brand, slo, shi, _, _ in Q19_CLASSES:
        class_keys.append(_sorted_key_array(read_parquet_clean(
            _doc_path(sf_dir, "part"),
            columns=["p_partkey", "p_brand", "p_size"],
            filter=(pc.field("p_brand") == brand)
            & (pc.field("p_size") >= slo) & (pc.field("p_size") <= shi)),
            "p_partkey"))
    keys_ref = ray.put(class_keys)
    qty_ranges = [(q[3], q[4]) for q in Q19_CLASSES]

    def rev_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        part = batch["l_partkey"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        rev = _rev_e4(batch)  # integer-exact: layout-independent 2-dp sum
        hit = np.zeros(len(part), bool)
        for ck, (qlo, qhi) in zip(keys, qty_ranges):
            hit |= _member(ck, part) & (qty >= qlo) & (qty <= qhi)
        return pa.table({"part": pa.array([float(rev[hit].sum())],
                                          pa.float64())})

    total = (read_parquet_clean(
        _doc_path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(rev_partial, batch_format="pyarrow", batch_size=None)
        .aggregate(Sum("part", alias_name="s"))["s"]) or 0.0
    return pa.table({"revenue": pa.array([round(total / 1e4, 2)],
                                         pa.float64())})


_Q19_DISJUNCTS = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
    f" AND l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in Q19_CLASSES)
SQL["q19_disjunctive_revenue"] = f"""
SELECT round(sum(round(l_extendedprice * 100)
                 * (100 - round(l_discount * 100))) / 10000.0, 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_Q19_DISJUNCTS}
"""


# --------------------------- Q21: sole latest shipper in shared orders

Q21_LIMIT = 20


def last_shipper(sf_dir: str, limit: int = Q21_LIMIT) -> pa.Table:
    """Q21 — TPC-H Q21 shape (adapted: no receipt/commit dates, so "kept
    the order waiting" becomes "was the SOLE supplier shipping on the
    order's final ship date"): for finished multi-supplier orders, count
    per supplier the lineitems where that supplier alone shipped last —
    the EXISTS + NOT-EXISTS self-join pattern.

    Scale shape: the self-join never happens as a join — lineitem is
    semi-filtered to finished orders, sorted ONCE by orderkey, and each
    block resolves its interior runs with vectorized per-run max/distinct
    scans (np.maximum.reduceat + first-pair masks); edge runs (<= 2 per
    block, each one order's few lineitems) merge on the driver."""
    from ..stages.runs import semi_id_filter

    def order_keys(batch: pa.Table) -> pa.Table:
        return pa.table({"orderkey": batch["o_orderkey"].cast(pa.int64())})

    forders = read_parquet_clean(
        _doc_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderstatus"],
        filter=pc.field("o_orderstatus") == "F",
    ).map_batches(order_keys, batch_format="pyarrow", batch_size=65536)

    def li_cols(batch: pa.Table) -> pa.Table:
        return pa.table({
            "orderkey": batch["l_orderkey"].cast(pa.int64()),
            "suppkey": batch["l_suppkey"].cast(pa.int64()),
            "ship": batch["l_shipdate"].cast(pa.timestamp("us")),
        })

    lines = read_parquet_clean(
        _doc_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(li_cols, batch_format="pyarrow", batch_size=65536)
    lines = semi_id_filter(lines, forders, id_col="orderkey")

    def scan(k, s, t, skip_edge: bool):
        """(suppkey, count) partials for qualifying rows of sorted arrays."""
        if k.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        new = np.r_[True, k[1:] != k[:-1]]
        rid = np.cumsum(new) - 1
        nruns = rid[-1] + 1
        starts = np.flatnonzero(new)
        mx = np.maximum.reduceat(t, starts)
        at_max = t == mx[rid]

        def distinct_per_run(mask):
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                return np.zeros(nruns, np.int64)
            order = idx[np.argsort(s[idx], kind="stable")]
            order = order[np.argsort(rid[order], kind="stable")]
            kk, ss = rid[order], s[order]
            first = np.r_[True, (kk[1:] != kk[:-1]) | (ss[1:] != ss[:-1])]
            return np.bincount(kk[first], minlength=nruns)

        n_all = distinct_per_run(np.ones(k.size, bool))
        n_max = distinct_per_run(at_max)
        qual_run = (n_all >= 2) & (n_max == 1)
        rows = at_max & qual_run[rid]
        if skip_edge:
            rows &= (rid != 0) & (rid != nruns - 1)
        if not rows.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        u, cnt = np.unique(s[rows], return_counts=True)
        return u, cnt.astype(np.int64)

    def block_scan(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "partial": pa.array([], pa.bool_()),
            "orderkey": pa.array([], pa.int64()),
            "suppkey": pa.array([], pa.int64()),
            "ship": pa.array([], pa.timestamp("us")),
            "cnt": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        k = batch["orderkey"].to_numpy(zero_copy_only=False)
        s = batch["suppkey"].to_numpy(zero_copy_only=False)
        t = batch["ship"].to_numpy(zero_copy_only=False).view(np.int64)
        u, cnt = scan(k, s, t, skip_edge=True)
        new = np.r_[True, k[1:] != k[:-1]]
        rid = np.cumsum(new) - 1
        raw = batch.filter(pa.array((rid == 0) | (rid == rid[-1])))
        inter = pa.table({
            "partial": pa.array(np.zeros(u.size, bool)),
            "orderkey": pa.array(np.zeros(u.size, np.int64)),
            "suppkey": pa.array(u, pa.int64()),
            "ship": pa.array(np.zeros(u.size, "datetime64[us]")),
            "cnt": pa.array(cnt, pa.int64())})
        rawt = pa.table({
            "partial": pa.array(np.ones(raw.num_rows, bool)),
            "orderkey": raw["orderkey"],
            "suppkey": raw["suppkey"],
            "ship": raw["ship"],
            "cnt": pa.array(np.zeros(raw.num_rows, np.int64))})
        return pa.concat_tables([inter, rawt])

    seg = (lines.sort("orderkey")
           .map_batches(block_scan, batch_format="pyarrow", batch_size=None))
    per_supp: dict[int, int] = {}
    bound: list[pa.Table] = []
    for b in seg.iter_batches(batch_format="pyarrow"):
        it = b.filter(pc.invert(b["partial"]))
        for sp, c in zip(it["suppkey"].to_pylist(), it["cnt"].to_pylist()):
            per_supp[sp] = per_supp.get(sp, 0) + c
        bb = b.filter(b["partial"])
        if bb.num_rows:
            bound.append(bb)
    if bound:
        bt = pa.concat_tables(bound)
        k = bt["orderkey"].to_numpy(zero_copy_only=False)
        s = bt["suppkey"].to_numpy(zero_copy_only=False)
        t = bt["ship"].to_numpy(zero_copy_only=False).view(np.int64)
        order = np.argsort(k, kind="stable")
        u, cnt = scan(k[order], s[order], t[order], skip_edge=False)
        for sp, c in zip(u.tolist(), cnt.tolist()):
            per_supp[sp] = per_supp.get(sp, 0) + c

    supp = read_parquet_clean(
        _doc_path(sf_dir, "supplier"), columns=["s_suppkey", "s_name"],
        filter=pc.field("s_suppkey").isin(list(per_supp))).take_all()
    name_of = {int(r["s_suppkey"]): r["s_name"] for r in supp}
    rows = sorted(((name_of[k], c) for k, c in per_supp.items()),
                  key=lambda r: (-r[1], r[0]))[:limit]
    return pa.table({
        "s_name": pa.array([r[0] for r in rows], pa.string()),
        "numwait": pa.array([r[1] for r in rows], pa.int64()),
    })


SQL["q21_last_shipper"] = f"""
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate = (SELECT max(l2.l_shipdate) FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey)
  AND EXISTS (SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l4
                  WHERE l4.l_orderkey = l1.l_orderkey
                    AND l4.l_suppkey <> l1.l_suppkey
                    AND l4.l_shipdate = l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {Q21_LIMIT}
"""


# ------------------------------- A22: ordered per-user event paths

A22_MAX_EVENTS = 30


def event_paths(sf_dir: str, cap: int = A22_MAX_EVENTS) -> pa.Table:
    """A22 — ordered string aggregation per key (the funnel family's
    output-preserving sibling): each user's first `cap` events joined
    '->' in (ts, event_id) order.

    Scale shape: ONE sort by (user_id, ts, event_id); interior runs of
    each block resolve with Arrow's C++ grouped list aggregation (no
    Python per-user loop) after a vectorized first-`cap` mask; edge runs
    ship at most 2 x cap raw rows per block to the driver. Per-user state
    is bounded by `cap`, so a hot user cannot blow up a task."""

    ev = read_parquet_clean(
        _doc_path(sf_dir, "events"),
        columns=["user_id", "ts", "event_id", "event_type"])

    def finish(t: pa.Table) -> pa.Table:
        """Sorted rows (already first-`cap`-masked) -> one row per user."""
        g = (t.select(["user_id", "event_type"])
             .group_by("user_id", use_threads=False)
             .aggregate([("event_type", "list"), ("event_type", "count")]))
        path = pc.binary_join(
            g["event_type_list"].cast(pa.list_(pa.string())), "->")
        return pa.table({
            "user_id": g["user_id"].cast(pa.int64()),
            "path": path,
            "n_path": g["event_type_count"].cast(pa.int64())})

    def cap_mask(k: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        new = np.r_[True, k[1:] != k[:-1]]
        rid = np.cumsum(new) - 1
        pos = np.arange(k.size) - np.flatnonzero(new)[rid]
        return rid, pos, new

    def block_paths(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "partial": pa.array([], pa.bool_()),
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "event_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "path": pa.array([], pa.string()),
            "n_path": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        k = batch["user_id"].to_numpy(zero_copy_only=False)
        rid, pos, _ = cap_mask(k)
        edge = (rid == 0) | (rid == rid[-1])
        raw = batch.filter(pa.array(edge & (pos < cap)))
        interior = batch.filter(pa.array(~edge & (pos < cap)))
        fin = finish(interior)
        n = fin.num_rows
        inter = pa.table({
            "partial": pa.array(np.zeros(n, bool)),
            "user_id": fin["user_id"],
            "ts": pa.array(np.zeros(n, "datetime64[us]")),
            "event_id": pa.array(np.zeros(n, np.int64)),
            "event_type": pa.array([""] * n, pa.string()),
            "path": fin["path"],
            "n_path": fin["n_path"]})
        rawt = pa.table({
            "partial": pa.array(np.ones(raw.num_rows, bool)),
            "user_id": raw["user_id"].cast(pa.int64()),
            "ts": raw["ts"],
            "event_id": raw["event_id"].cast(pa.int64()),
            "event_type": raw["event_type"],
            "path": pa.array([""] * raw.num_rows, pa.string()),
            "n_path": pa.array(np.zeros(raw.num_rows, np.int64))})
        return pa.concat_tables([inter, rawt])

    seg = (ev.sort(["user_id", "ts", "event_id"])
           .map_batches(block_paths, batch_format="pyarrow",
                        batch_size=None))
    done: list[pa.Table] = []
    bound: list[pa.Table] = []
    for b in seg.iter_batches(batch_format="pyarrow"):
        it = b.filter(pc.invert(b["partial"]))
        if it.num_rows:
            done.append(it.select(["user_id", "path", "n_path"]))
        bb = b.filter(b["partial"])
        if bb.num_rows:
            bound.append(bb.select(["user_id", "ts", "event_id",
                                    "event_type"]))
    if bound:  # <= 2*cap rows per block: bounded driver merge
        bt = pa.concat_tables(bound)
        k = bt["user_id"].to_numpy(zero_copy_only=False)
        ts = bt["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = bt["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, k))
        bt = bt.take(pa.array(order))
        k = k[order]
        rid, pos, _ = cap_mask(k)
        done.append(finish(bt.filter(pa.array(pos < cap))))
    out = pa.concat_tables(done) if done else pa.table({
        "user_id": pa.array([], pa.int64()),
        "path": pa.array([], pa.string()),
        "n_path": pa.array([], pa.int64())})
    order = np.argsort(out["user_id"].to_numpy(zero_copy_only=False),
                       kind="stable")
    return out.take(pa.array(order))


SQL["a22_event_paths"] = f"""
SELECT CAST(user_id AS BIGINT) AS user_id,
       string_agg(event_type, '->' ORDER BY ts, event_id) AS path,
       CAST(count(*) AS BIGINT) AS n_path
FROM (SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn <= {A22_MAX_EVENTS}
GROUP BY user_id
ORDER BY user_id
"""


# ------------------------------------- J16: grouped mode (argmax count)

def grouped_mode(sf_dir: str) -> pa.Table:
    """J16 — grouped mode: each user's most frequent event type (ties
    break to the lexicographically smallest type).

    Scale shape: per-batch (user, type) count combiner -> ONE
    groupby(user, type) sum (rows bounded by users x distinct types) ->
    sort by user + per-block vectorized argmax run scan with <= 2 edge
    runs per block merged on the driver. No global window, no per-user
    Python dispatch."""

    def type_counts(batch: pa.Table) -> pa.Table:
        return (batch.group_by(["user_id", "event_type"],
                               use_threads=False)
                .aggregate([([], "count_all")])
                .rename_columns(["user_id", "event_type", "cnt"]))

    counts = (read_parquet_clean(
        _doc_path(sf_dir, "events"), columns=["user_id", "event_type"])
        .map_batches(type_counts, batch_format="pyarrow", batch_size=65536)
        .groupby(["user_id", "event_type"]).sum("cnt"))

    def argmax_scan(t: pa.Table, skip_edge: bool):
        k = t["user_id"].to_numpy(zero_copy_only=False)
        c = t["sum(cnt)"].to_numpy(zero_copy_only=False)
        types = np.asarray(t["event_type"].to_pylist(), dtype=object)
        if k.size == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "mode_type": pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64())})
        _, tcode = np.unique(types, return_inverse=True)
        order = np.lexsort((tcode, -c, k))
        kk = k[order]
        first = np.r_[True, kk[1:] != kk[:-1]]
        win = order[first]
        keep = np.ones(win.size, bool)
        if skip_edge:
            new = np.r_[True, k[1:] != k[:-1]]
            rid = np.cumsum(new) - 1
            win_rid = rid[win]
            keep = (win_rid != 0) & (win_rid != rid[-1])
        win = win[keep]
        return pa.table({
            "user_id": pa.array(k[win].astype(np.int64)),
            "mode_type": pa.array(types[win].tolist(), pa.string()),
            "n_events": pa.array(c[win].astype(np.int64))})

    def block_argmax(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "partial": pa.array([], pa.bool_()),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "mode_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        k = batch["user_id"].to_numpy(zero_copy_only=False)
        new = np.r_[True, k[1:] != k[:-1]]
        rid = np.cumsum(new) - 1
        edge = (rid == 0) | (rid == rid[-1])
        raw = batch.filter(pa.array(edge))
        fin = argmax_scan(batch, skip_edge=True)
        n = fin.num_rows
        inter = pa.table({
            "partial": pa.array(np.zeros(n, bool)),
            "user_id": fin["user_id"],
            "event_type": pa.array([""] * n, pa.string()),
            "cnt": pa.array(np.zeros(n, np.int64)),
            "mode_type": fin["mode_type"],
            "n_events": fin["n_events"]})
        rawt = pa.table({
            "partial": pa.array(np.ones(raw.num_rows, bool)),
            "user_id": raw["user_id"].cast(pa.int64()),
            "event_type": raw["event_type"],
            "cnt": raw["sum(cnt)"].cast(pa.int64()),
            "mode_type": pa.array([""] * raw.num_rows, pa.string()),
            "n_events": pa.array(np.zeros(raw.num_rows, np.int64))})
        return pa.concat_tables([inter, rawt])

    seg = (counts.sort("user_id")
           .map_batches(block_argmax, batch_format="pyarrow",
                        batch_size=None))
    done: list[pa.Table] = []
    bound: list[pa.Table] = []
    for b in seg.iter_batches(batch_format="pyarrow"):
        it = b.filter(pc.invert(b["partial"]))
        if it.num_rows:
            done.append(it.select(["user_id", "mode_type", "n_events"]))
        bb = b.filter(b["partial"])
        if bb.num_rows:
            bound.append(pa.table({
                "user_id": bb["user_id"],
                "event_type": bb["event_type"],
                "sum(cnt)": bb["cnt"]}))
    if bound:  # <= 2 user runs per block: bounded driver merge
        bt = pa.concat_tables(bound)
        k = bt["user_id"].to_numpy(zero_copy_only=False)
        bt = bt.take(pa.array(np.argsort(k, kind="stable")))
        done.append(argmax_scan(bt, skip_edge=False))
    out = pa.concat_tables(done) if done else pa.table({
        "user_id": pa.array([], pa.int64()),
        "mode_type": pa.array([], pa.string()),
        "n_events": pa.array([], pa.int64())})
    order = np.argsort(out["user_id"].to_numpy(zero_copy_only=False),
                       kind="stable")
    return out.take(pa.array(order))


# --------------------- K20: frequent co-purchase pairs (market basket)

K20_SUPPORT_DIV = 600  # min support = ceil(n_orders / 600)


def copurchase_pairs(sf_dir: str) -> pa.Table:
    """K20 — frequent-itemset mining at pair size (the market-basket
    staple): supplier pairs appearing together in at least
    ceil(n_orders/600) orders.

    Scale shape: the self-join never happens as a join — lineitem sorts
    ONCE by (orderkey, suppkey); within each block, adjacent dedup then a
    bounded OFFSET loop (d = 1..max items per order, each step fully
    vectorized: supp[:-d] pairs supp[d:] where the run id matches)
    expands pairs — per-run Python dispatch never occurs and the loop
    bound is the max basket size, not the order count. Pair counts pack
    into (a << 32 | b) int64 keys; ONE groupby(pair) sums; the support
    threshold (a tiny count aggregate) filters distributed."""
    import math

    li = read_parquet_clean(
        _doc_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey"])
    n_orders = read_parquet_clean(
        _doc_path(sf_dir, "orders"), columns=["o_orderkey"]).count()
    support = math.ceil(n_orders / K20_SUPPORT_DIV)

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "orderkey": batch["l_orderkey"].cast(pa.int64()),
            "suppkey": batch["l_suppkey"].cast(pa.int64()),
        })

    def pair_counts(k, s):
        """(pair_key, count) over arrays sorted by (orderkey, suppkey),
        deduped per (orderkey, suppkey)."""
        if k.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        first = np.r_[True, (k[1:] != k[:-1]) | (s[1:] != s[:-1])]
        k, s = k[first], s[first]
        new = np.r_[True, k[1:] != k[:-1]]
        rid = np.cumsum(new) - 1
        lens = np.bincount(rid)
        pairs = []
        for d in range(1, int(lens.max()) if lens.size else 1):
            ok = rid[:-d] == rid[d:] if k.size > d else np.empty(0, bool)
            if not ok.any():
                break
            pairs.append((s[:-d][ok] << 32) | s[d:][ok])
        if not pairs:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        u, cnt = np.unique(np.concatenate(pairs), return_counts=True)
        return u, cnt.astype(np.int64)

    def block_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "partial": pa.array([], pa.bool_()),
            "orderkey": pa.array([], pa.int64()),
            "suppkey": pa.array([], pa.int64()),
            "pair": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        k = batch["orderkey"].to_numpy(zero_copy_only=False)
        s = batch["suppkey"].to_numpy(zero_copy_only=False)
        new = np.r_[True, k[1:] != k[:-1]]
        rid = np.cumsum(new) - 1
        interior = (rid != 0) & (rid != rid[-1])
        u, cnt = pair_counts(k[interior], s[interior])
        raw = batch.filter(pa.array(~interior))
        inter = pa.table({
            "partial": pa.array(np.zeros(u.size, bool)),
            "orderkey": pa.array(np.zeros(u.size, np.int64)),
            "suppkey": pa.array(np.zeros(u.size, np.int64)),
            "pair": pa.array(u, pa.int64()),
            "cnt": pa.array(cnt, pa.int64())})
        rawt = pa.table({
            "partial": pa.array(np.ones(raw.num_rows, bool)),
            "orderkey": raw["orderkey"],
            "suppkey": raw["suppkey"],
            "pair": pa.array(np.zeros(raw.num_rows, np.int64)),
            "cnt": pa.array(np.zeros(raw.num_rows, np.int64))})
        return pa.concat_tables([inter, rawt])

    seg = (li.map_batches(keyed, batch_format="pyarrow", batch_size=65536)
           .sort(["orderkey", "suppkey"])
           .map_batches(block_pairs, batch_format="pyarrow",
                        batch_size=None).materialize())
    parts = [seg.filter(expr="partial == False")
             .select_columns(["pair", "cnt"])]
    raws = [b for b in seg.filter(expr="partial == True")
            .iter_batches(batch_format="pyarrow")]
    if raws:  # <= 2 basket-sized runs per block: bounded driver merge
        bt = pa.concat_tables(raws)
        k = bt["orderkey"].to_numpy(zero_copy_only=False)
        s = bt["suppkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, k))
        u, cnt = pair_counts(k[order], s[order])
        if u.size:
            parts.append(ray.data.from_arrow(pa.table({
                "pair": pa.array(u, pa.int64()),
                "cnt": pa.array(cnt, pa.int64())})))
    ds = parts[0]
    for extra in parts[1:]:
        ds = ds.union(extra)
    def above_support(batch: pa.Table) -> pa.Table:
        c = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(c >= support))

    hits = (ds.groupby("pair").sum("cnt")
            .map_batches(above_support, batch_format="pyarrow",
                         batch_size=65536)).take_all()
    hits.sort(key=lambda r: r["pair"])
    pk = np.array([r["pair"] for r in hits], np.int64)
    nc = np.array([r["sum(cnt)"] for r in hits], np.int64)
    return pa.table({
        "supp_a": pa.array(pk >> 32, pa.int64()),
        "supp_b": pa.array(pk & 0xFFFFFFFF, pa.int64()),
        "n_orders": pa.array(nc, pa.int64()),
    })


SQL["k20_copurchase_pairs"] = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
     pairs AS (SELECT l1.l_suppkey AS supp_a, l2.l_suppkey AS supp_b,
                      count(*) AS n_orders
               FROM items l1 JOIN items l2
                 ON l1.l_orderkey = l2.l_orderkey
                AND l1.l_suppkey < l2.l_suppkey
               GROUP BY 1, 2)
SELECT CAST(supp_a AS BIGINT) AS supp_a,
       CAST(supp_b AS BIGINT) AS supp_b,
       CAST(n_orders AS BIGINT) AS n_orders
FROM pairs
WHERE n_orders >= CEIL((SELECT count(*) FROM orders)
                       / {K20_SUPPORT_DIV}.0)
ORDER BY 1, 2
"""


# ----------------------------------- G1: PageRank on the purchase graph

def _orderkey_pair_edges(dim_ds, fact_ds):
    """Union + ONE sort(orderkey) + per-block run reduce into DISTINCT
    (factf, dimv) pair counts that STAY a Dataset (edges scale with the
    corpus, so — unlike `_orderkey_join_sums`'s bounded outputs — nothing
    may collect on the driver except the <= 2 edge runs per block, which
    re-enter as a tiny from_arrow Dataset). Returns (edge:int64 packed
    factf<<32|dimv, cnt:int64) deduped by one groupby(edge)."""

    def block_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "partial": pa.array([], pa.bool_()),
            "orderkey": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "dimv": pa.array([], pa.int32()),
            "factf": pa.array([], pa.int64()),
            "vol": pa.array([], pa.float64()),
            "edge": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        k, side, dimv, factf, vol = _okjoin_arrays(batch)
        u, sums = _dimfact_reduce(k, side, dimv, factf,
                                  np.ones(k.size, np.float64),
                                  skip_edge=True, bits=32)
        new = np.r_[True, k[1:] != k[:-1]]
        rid = np.cumsum(new) - 1
        raw = batch.filter(pa.array((rid == 0) | (rid == rid[-1])))
        inter = pa.table({
            "partial": pa.array(np.zeros(u.size, bool)),
            "orderkey": pa.array(np.zeros(u.size, np.int64)),
            "side": pa.array(np.full(u.size, -1, np.int8)),
            "dimv": pa.array(np.zeros(u.size, np.int32)),
            "factf": pa.array(np.zeros(u.size, np.int64)),
            "vol": pa.array(np.zeros(u.size, np.float64)),
            "edge": pa.array(u, pa.int64()),
            "cnt": pa.array(sums.astype(np.int64))})
        rawt = pa.table({
            "partial": pa.array(np.ones(raw.num_rows, bool)),
            "orderkey": raw["orderkey"], "side": raw["side"],
            "dimv": raw["dimv"], "factf": raw["factf"], "vol": raw["vol"],
            "edge": pa.array(np.zeros(raw.num_rows, np.int64)),
            "cnt": pa.array(np.zeros(raw.num_rows, np.int64))})
        return pa.concat_tables([inter, rawt])

    seg = (dim_ds.union(fact_ds).sort("orderkey")
           .map_batches(block_pairs, batch_format="pyarrow",
                        batch_size=None).materialize())
    parts = [seg.filter(expr="partial == False")
             .select_columns(["edge", "cnt"])]
    raws = [b for b in seg.filter(expr="partial == True")
            .iter_batches(batch_format="pyarrow")]
    if raws:  # <= 2 orderkey runs per block: bounded driver merge
        bt = pa.concat_tables(raws)
        k, side, dimv, factf, vol = _okjoin_arrays(bt)
        order = np.argsort(k, kind="stable")
        u, sums = _dimfact_reduce(k[order], side[order], dimv[order],
                                  factf[order], np.ones(k.size, np.float64),
                                  skip_edge=False, bits=32)
        if u.size:
            parts.append(ray.data.from_arrow(pa.table({
                "edge": pa.array(u, pa.int64()),
                "cnt": pa.array(sums.astype(np.int64))})))
    ds = parts[0]
    for extra in parts[1:]:
        ds = ds.union(extra)
    # sort+run-scan combine: ~5x faster than the Aggregate operator here
    # (11.6s -> ~2s at sf0.1's 587k pair rows, BASELINE.md round 4)
    from ..stages.runs import sum_by_int_key

    return sum_by_int_key(ds, "edge", "cnt")


_PR_SUPP_BASE = 1 << 32  # supplier node ids live above the custkey range


def purchase_pagerank(sf_dir: str, n_iter: int = 5,
                      damping: float = 0.85):
    """G1 — PageRank over the customer<->supplier purchase graph (edges =
    distinct (customer, supplier) trade pairs weighted by lineitem count,
    both orientations): which suppliers/customers sit most centrally in
    the trade network — the canonical link-graph algorithm a web-corpus
    engine needs (same machinery ranks url hosts by hyperlink).

    Scale shape: edges are built with the same ONE-sort co-partition
    machinery as Q8/Q9 but kept fully distributed
    (`_orderkey_pair_edges`); ranks iterate via `stages.graph.pagerank` —
    per-node state is exchanged through sort + groupby each iteration,
    never broadcast. Approximate by iteration count only — deterministic,
    so the numpy power-iteration parity is pytest-asserted."""
    from ..stages.graph import pagerank

    def orders_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _union_schema(
            n, batch["o_orderkey"].cast(pa.int64()), 1,
            batch["o_custkey"].cast(pa.int32()),
            np.zeros(n, np.int64), np.zeros(n))

    def lineitem_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _union_schema(
            n, batch["l_orderkey"].cast(pa.int64()), 0,
            np.zeros(n, np.int32),
            batch["l_suppkey"].cast(pa.int64()), np.zeros(n))

    orders = read_parquet_clean(
        _doc_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"],
    ).map_batches(orders_side, batch_format="pyarrow", batch_size=65536)
    lines = read_parquet_clean(
        _doc_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey"],
    ).map_batches(lineitem_side, batch_format="pyarrow", batch_size=65536)
    pair_counts = _orderkey_pair_edges(orders, lines)

    def both_orientations(batch: pa.Table) -> pa.Table:
        e = batch["edge"].to_numpy(zero_copy_only=False)
        c = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        supp = (e >> 32) + _PR_SUPP_BASE
        cust = e & 0xFFFFFFFF
        return pa.table({
            "src": pa.array(np.concatenate([cust, supp]).astype(np.int64)),
            "dst": pa.array(np.concatenate([supp, cust]).astype(np.int64)),
            "w": pa.array(np.concatenate([c, c]).astype(np.float64)),
        })

    edges = pair_counts.map_batches(both_orientations,
                                    batch_format="pyarrow",
                                    batch_size=65536)
    ranks = pagerank(edges, n_iter=n_iter, damping=damping)

    def decode(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        is_supp = node >= _PR_SUPP_BASE
        return pa.table({
            "node_type": pa.array(
                np.where(is_supp, "supplier", "customer").tolist(),
                pa.string()),
            "key": pa.array(np.where(is_supp, node - _PR_SUPP_BASE,
                                     node).astype(np.int64)),
            "rank": batch["rank"],
        })

    return ranks.map_batches(decode, batch_format="pyarrow",
                             batch_size=65536)


def purchase_hits(sf_dir: str, n_iter: int = 5):
    """G2 — HITS hubs/authorities over the DIRECTED customer -> supplier
    purchase graph (edge weight = lineitem count): hub customers buy from
    many well-connected suppliers; authority suppliers serve many
    well-connected customers. Same distributed machinery as PageRank
    (`stages.graph.push_scores`, two exchanges per iteration, no
    strength division, L2 normalization as one scalar aggregate)."""
    from ..stages.graph import hits

    def orders_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _union_schema(
            n, batch["o_orderkey"].cast(pa.int64()), 1,
            batch["o_custkey"].cast(pa.int32()),
            np.zeros(n, np.int64), np.zeros(n))

    def lineitem_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _union_schema(
            n, batch["l_orderkey"].cast(pa.int64()), 0,
            np.zeros(n, np.int32),
            batch["l_suppkey"].cast(pa.int64()), np.zeros(n))

    orders = read_parquet_clean(
        _doc_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"],
    ).map_batches(orders_side, batch_format="pyarrow", batch_size=65536)
    lines = read_parquet_clean(
        _doc_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey"],
    ).map_batches(lineitem_side, batch_format="pyarrow", batch_size=65536)
    pair_counts = _orderkey_pair_edges(orders, lines)

    def directed(batch: pa.Table) -> pa.Table:
        e = batch["edge"].to_numpy(zero_copy_only=False)
        c = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array((e & 0xFFFFFFFF).astype(np.int64)),
            "dst": pa.array(((e >> 32) + _PR_SUPP_BASE).astype(np.int64)),
            "w": pa.array(c.astype(np.float64)),
        })

    scores = hits(pair_counts.map_batches(
        directed, batch_format="pyarrow", batch_size=65536),
        n_iter=n_iter)

    def decode(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        is_supp = node >= _PR_SUPP_BASE
        return pa.table({
            "node_type": pa.array(
                np.where(is_supp, "supplier", "customer").tolist(),
                pa.string()),
            "key": pa.array(np.where(is_supp, node - _PR_SUPP_BASE,
                                     node).astype(np.int64)),
            "hub": batch["hub"],
            "authority": batch["authority"],
        })

    return scores.map_batches(decode, batch_format="pyarrow",
                              batch_size=65536)


# ----------------------------- J17: full outer join of two aggregates

def full_outer_counts(sf_dir: str) -> pa.Table:
    """J17 — FULL OUTER join shape: per-key order count vs event count
    where the key domains only partially overlap, null-extending BOTH
    sides (the one join variant the rest of the join family doesn't
    exercise).

    Scale shape: neither side ever ships raw rows — each folds to
    per-batch (key, count) combiner partials carrying a zero column for
    the other side's measure, so the full outer join IS the one
    groupby(key) sum; presence is recoverable because a present side's
    count is >= 1, so a zero sum means absent -> NULL."""

    def count_side(col: str, mine: str, other: str):
        def part(batch: pa.Table) -> pa.Table:
            k = batch[col].to_numpy(zero_copy_only=False)
            u, inv = np.unique(k, return_inverse=True)
            c = np.bincount(inv)
            return pa.table({
                "key_id": pa.array(u.astype(np.int64)),
                mine: pa.array(c.astype(np.int64)),
                other: pa.array(np.zeros(u.size, np.int64)),
            }).select(["key_id", "n_orders_p", "n_events_p"])
        return part

    orders = read_parquet_clean(
        _doc_path(sf_dir, "orders"), columns=["o_custkey"],
    ).map_batches(count_side("o_custkey", "n_orders_p", "n_events_p"),
                  batch_format="pyarrow", batch_size=65536)
    events = read_parquet_clean(
        _doc_path(sf_dir, "events"), columns=["user_id"],
    ).map_batches(count_side("user_id", "n_events_p", "n_orders_p"),
                  batch_format="pyarrow", batch_size=65536)

    def finish(t: pa.Table) -> pa.Table:
        no = t["sum(n_orders_p)"].to_numpy(zero_copy_only=False)
        ne = t["sum(n_events_p)"].to_numpy(zero_copy_only=False)
        return pa.table({
            "key_id": t["key_id"].cast(pa.int64()),
            "n_orders": pa.array(no.astype(np.int64), pa.int64(),
                                 mask=no == 0),
            "n_events": pa.array(ne.astype(np.int64), pa.int64(),
                                 mask=ne == 0),
        })

    return (orders.union(events)
            .groupby("key_id").sum(["n_orders_p", "n_events_p"])
            .map_batches(finish, batch_format="pyarrow"))


SQL["j17_full_outer_counts"] = """
SELECT COALESCE(o.k, e.k) AS key_id, o.n_orders, e.n_events
FROM (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1) o
FULL OUTER JOIN
     (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1) e
ON o.k = e.k
ORDER BY key_id
"""


# ---------------------------------------- A23: cohort retention matrix

def cohort_retention(sf_dir: str) -> pa.Table:
    """A23 — cohort retention: users grouped by first-activity month,
    counted in each subsequent month they were active (the product-
    analytics retention matrix).

    Scale shape: events never sort. A per-batch DISTINCT (user, month)
    combiner shrinks the stream to at most users x months rows; ONE sort
    by user then resolves each user run locally — cohort = the run's min
    month, one (cohort, offset) partial per distinct month — with <= 2
    edge runs per block merged on the driver. Output is bounded by
    months^2 cells."""

    def month_pairs(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        ym = (ts.astype("datetime64[M]").view(np.int64)
              + 1970 * 12)  # months since year 0 (exact int)
        pair = np.unique((u.astype(np.int64) << 20) | ym)
        return pa.table({
            "user_id": pa.array(pair >> 20, pa.int64()),
            "ym": pa.array((pair & _DIMV_MASK).astype(np.int32)),
        })

    pairs = (read_parquet_clean(
        _doc_path(sf_dir, "events"), columns=["user_id", "ts"])
        .map_batches(month_pairs, batch_format="pyarrow", batch_size=65536))

    def run_cells(k, ym, skip_edge: bool):
        """(cohort_ym << 20 | offset) -> count partials over sorted arrays;
        rows must be pre-deduped per (user, ym) within each run."""
        if k.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        new = np.r_[True, k[1:] != k[:-1]]
        rid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        cmin = np.minimum.reduceat(ym, starts)
        keep = np.ones(k.size, bool)
        if skip_edge:
            keep = (rid != 0) & (rid != rid[-1])
        if not keep.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        key = ((cmin[rid[keep]].astype(np.int64) << 20)
               | (ym[keep] - cmin[rid[keep]]).astype(np.int64))
        u, cnt = np.unique(key, return_counts=True)
        return u, cnt.astype(np.int64)

    def block_cells(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "partial": pa.array([], pa.bool_()),
            "user_id": pa.array([], pa.int64()),
            "ym": pa.array([], pa.int32()),
            "cell": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        k = batch["user_id"].to_numpy(zero_copy_only=False)
        # adjacent (user, ym) duplicates from different source batches
        # collapse here; edge-run dups collapse again on the driver
        ym = batch["ym"].to_numpy(zero_copy_only=False)
        first = np.r_[True, (k[1:] != k[:-1]) | (ym[1:] != ym[:-1])]
        k, ym = k[first], ym[first]
        u, cnt = run_cells(k, ym, skip_edge=True)
        new = np.r_[True, k[1:] != k[:-1]]
        rid = np.cumsum(new) - 1
        edge = (rid == 0) | (rid == rid[-1])
        inter = pa.table({
            "partial": pa.array(np.zeros(u.size, bool)),
            "user_id": pa.array(np.zeros(u.size, np.int64)),
            "ym": pa.array(np.zeros(u.size, np.int32)),
            "cell": pa.array(u, pa.int64()),
            "cnt": pa.array(cnt, pa.int64())})
        rawt = pa.table({
            "partial": pa.array(np.ones(int(edge.sum()), bool)),
            "user_id": pa.array(k[edge].astype(np.int64)),
            "ym": pa.array(ym[edge].astype(np.int32)),
            "cell": pa.array(np.zeros(int(edge.sum()), np.int64)),
            "cnt": pa.array(np.zeros(int(edge.sum()), np.int64))})
        return pa.concat_tables([inter, rawt])

    seg = (pairs.sort(["user_id", "ym"])
           .map_batches(block_cells, batch_format="pyarrow",
                        batch_size=None))
    cells: dict[int, int] = {}
    bk: list[np.ndarray] = []
    bm: list[np.ndarray] = []
    for b in seg.iter_batches(batch_format="pyarrow"):
        it = b.filter(pc.invert(b["partial"]))
        for c, n in zip(it["cell"].to_pylist(), it["cnt"].to_pylist()):
            cells[c] = cells.get(c, 0) + n
        bb = b.filter(b["partial"])
        if bb.num_rows:
            bk.append(bb["user_id"].to_numpy(zero_copy_only=False))
            bm.append(bb["ym"].to_numpy(zero_copy_only=False))
    if bk:  # <= 2 user runs per block: bounded driver merge
        k = np.concatenate(bk)
        ym = np.concatenate(bm).astype(np.int64)
        pair = np.unique((k << 20) | ym)  # cross-block (user, ym) dedup
        k, ym = pair >> 20, pair & _DIMV_MASK
        u, cnt = run_cells(k, ym, skip_edge=False)
        for c, n in zip(u.tolist(), cnt.tolist()):
            cells[c] = cells.get(c, 0) + n
    ck = np.array(sorted(cells), np.int64)
    cohort_ym = (ck >> 20) - 1970 * 12
    months = cohort_ym.astype("datetime64[M]").astype("datetime64[us]")
    return pa.table({
        "cohort_month": pa.array(months, pa.timestamp("us")),
        "month_offset": pa.array((ck & _DIMV_MASK).astype(np.int32)),
        "n_users": pa.array([cells[int(c)] for c in ck], pa.int64()),
    })


SQL["a23_cohort_retention"] = """
WITH acts AS (SELECT DISTINCT user_id, date_trunc('month', ts) AS amonth
              FROM events),
     firsts AS (SELECT user_id, min(amonth) AS cohort FROM acts
                GROUP BY user_id)
SELECT CAST(cohort AS TIMESTAMP) AS cohort_month,
       CAST(datediff('month', cohort, amonth) AS INTEGER) AS month_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM firsts JOIN acts USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


SQL["j16_grouped_mode"] = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       event_type AS mode_type,
       CAST(cnt AS BIGINT) AS n_events
FROM (SELECT user_id, event_type, count(*) AS cnt,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type)
WHERE rn = 1
ORDER BY user_id
"""
