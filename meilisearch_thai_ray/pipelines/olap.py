"""OLAP join/aggregate shapes beyond the Q1/Q3/Q5/Q13/Q22 family in
`simple_text.py` — each one demonstrates a distinct distributed pattern a
100-TB pipeline needs, and each is DuckDB-hash-verified by the driver gate.

j13_big_orders  (TPC-H Q18 shape): HAVING-filtered aggregate whose tiny
    qualifying set is broadcast BACK into the fact scans — the canonical
    "rare-tail semi-join" where the only all-to-all exchange is the
    unavoidable per-orderkey sum.
a13_distinct_suppliers (TPC-H Q16 shape): COUNT(DISTINCT ...) GROUP BY via
    per-batch triple dedup (the combiner) + one small groupby — the
    distinct-count pattern where batch-level dedup bounds what shuffles.
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


# ----------------------------------------------- Q18: large-volume orders

Q18_MIN_QTY = 200  # HAVING sum(l_quantity) > 200: ~0.7% of orders qualify
Q18_LIMIT = 100


def big_orders(sf_dir: str, threshold: float = Q18_MIN_QTY,
               limit: int = Q18_LIMIT) -> pa.Table:
    """J13 — TPC-H Q18 shape: customers whose single orders exceed
    `threshold` total quantity, with full order detail.

    Scale shape: stage 1 is the one unavoidable exchange — a per-batch
    (orderkey, qty) combiner (np.unique + bincount shrinks each block to
    its distinct orderkeys, ~4x here) feeding ONE groupby(orderkey) sum.
    The HAVING filter then selects a tail that is tiny BY CONSTRUCTION
    (thresholds exist to be rarely exceeded), so qualifying orderkeys are
    broadcast via ray.put and both the orders scan and the customer read
    become streaming filters — no join shuffle ever happens. The driver
    assembles <= limit final rows. l_quantity is integral in TPC-H, so the
    distributed sum is addition-order-exact vs the SQL oracle."""
    li = read_parquet_clean(
        _doc_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"])

    def qty_partial(batch: pa.Table) -> pa.Table:
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(k, return_inverse=True)
        s = np.bincount(inv, weights=q)
        return pa.table({"l_orderkey": pa.array(u, pa.int64()),
                         "qty_part": pa.array(s, pa.float64())})

    sums = (li.map_batches(qty_partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("l_orderkey")
            .aggregate(Sum("qty_part", alias_name="total_qty")))
    qual = sums.filter(expr=f"total_qty > {float(threshold)}").take_all()
    if not qual:
        return pa.table({
            "c_name": pa.array([], pa.string()),
            "c_custkey": pa.array([], pa.int64()),
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "o_totalprice": pa.array([], pa.float64()),
            "total_qty": pa.array([], pa.float64()),
        })
    qk = np.array(sorted(r["l_orderkey"] for r in qual), np.int64)
    qty = {int(r["l_orderkey"]): float(r["total_qty"]) for r in qual}
    qk_ref = ray.put(qk)

    def orders_filter(batch: pa.Table) -> pa.Table:
        keys = ray.get(qk_ref)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, ok)
        idx = np.minimum(idx, max(len(keys) - 1, 0))
        return batch.filter(pa.array(keys[idx] == ok))

    orders = read_parquet_clean(
        _doc_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(orders_filter, batch_format="pyarrow",
                  batch_size=65536).take_all()
    custkeys = sorted({int(r["o_custkey"]) for r in orders})
    cust = read_parquet_clean(
        _doc_path(sf_dir, "customer"), columns=["c_custkey", "c_name"],
        filter=pc.field("c_custkey").isin(custkeys)).take_all()
    cname = {int(r["c_custkey"]): r["c_name"] for r in cust}

    orders.sort(key=lambda r: (-r["o_totalprice"], r["o_orderkey"]))
    top = orders[:limit]
    return pa.table({
        "c_name": pa.array([cname[int(r["o_custkey"])] for r in top],
                           pa.string()),
        "c_custkey": pa.array([int(r["o_custkey"]) for r in top], pa.int64()),
        "o_orderkey": pa.array([int(r["o_orderkey"]) for r in top],
                               pa.int64()),
        "o_orderdate": pa.array([r["o_orderdate"] for r in top],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([float(r["o_totalprice"]) for r in top],
                                 pa.float64()),
        "total_qty": pa.array([qty[int(r["o_orderkey"])] for r in top],
                              pa.float64()),
    })


SQL["j13_big_orders"] = f"""
SELECT c_name,
       CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_orderdate, o_totalprice,
       sum(l_quantity) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING sum(l_quantity) > {Q18_MIN_QTY})
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT {Q18_LIMIT}
"""


# ------------------------------------ Q16: distinct-count by part attrs

Q16_MAX_SIZE = 10  # p_size <= 10: 1/5 of parts


def distinct_suppliers(sf_dir: str,
                       max_size: int = Q16_MAX_SIZE) -> ray.data.Dataset:
    """A13 — TPC-H Q16 shape: how many DISTINCT suppliers ship each
    (p_brand, p_type) among small parts.

    Distributed COUNT(DISTINCT) pattern: the part dim is broadcast as
    sorted (partkey -> brand/type code) arrays; each lineitem batch maps
    its partkeys and emits its batch-DEDUPED (brand, type, suppkey)
    triples — the combiner that bounds the exchange at
    |groups| x |suppliers per batch| instead of |lines|. One
    groupby(brand, type) then counts unique suppkeys per group
    (group count = 150 here; each group's row count is bounded by the
    supplier dimension, not the fact table)."""
    part = read_parquet_clean(
        _doc_path(sf_dir, "part"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filter=pc.field("p_size") <= max_size).take_all()
    pk = np.array([r["p_partkey"] for r in part], np.int64)
    order = np.argsort(pk)
    pk = pk[order]
    brands = np.array([part[i]["p_brand"] for i in order], object)
    types = np.array([part[i]["p_type"] for i in order], object)
    dim_ref = ray.put((pk, brands, types))

    def triples(batch: pa.Table) -> pa.Table:
        pk, brands, types = ray.get(dim_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(pk, lp)
        idx = np.minimum(idx, max(len(pk) - 1, 0))
        hit = (pk[idx] == lp) if len(pk) else np.zeros(len(lp), bool)
        idx, ls = idx[hit], ls[hit]
        # batch-level triple dedup: (part-row, suppkey) uniqueness implies
        # (brand, type, suppkey) coverage after the groupby's union
        key = idx.astype(np.uint64) * np.uint64(1 << 32) + ls.astype(
            np.uint64)
        _u, first = np.unique(key, return_index=True)
        idx, ls = idx[first], ls[first]
        return pa.table({
            "p_brand": pa.array(brands[idx], pa.string()),
            "p_type": pa.array(types[idx], pa.string()),
            "l_suppkey": pa.array(ls, pa.int64()),
        })

    def count_unique(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"p_brand": pa.array([], pa.string()),
                             "p_type": pa.array([], pa.string()),
                             "supplier_cnt": pa.array([], pa.int64())})
        n = len(np.unique(group["l_suppkey"].to_numpy(zero_copy_only=False)))
        return pa.table({
            "p_brand": group["p_brand"].slice(0, 1),
            "p_type": group["p_type"].slice(0, 1),
            "supplier_cnt": pa.array([n], pa.int64()),
        })

    li = read_parquet_clean(
        _doc_path(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"])
    out = (li.map_batches(triples, batch_format="pyarrow", batch_size=65536)
           .groupby(["p_brand", "p_type"])
           .map_groups(count_unique, batch_format="pyarrow"))
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"),
                         promote_options="default")
    return t.take(pc.sort_indices(t, sort_keys=[
        ("supplier_cnt", "descending"), ("p_brand", "ascending"),
        ("p_type", "ascending")]))


SQL["a13_distinct_suppliers"] = f"""
SELECT p_brand, p_type,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size <= {Q16_MAX_SIZE}
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
"""


# --------------------------------------------- Q6: forecast revenue change

Q6_YEAR = "1996"
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_MAX_QTY = 24


def forecast_revenue(sf_dir: str) -> pa.Table:
    """Q6 — TPC-H Q6 shape: one global SUM over a triple-predicate scan.

    The pattern this demonstrates: EVERY predicate is pushed into the
    parquet read (row-group pruning on shipdate statistics + row filters),
    the per-batch kernel is one vectorized multiply, and the only thing
    that ever leaves a task is a single float64 partial — a scan-dominated
    aggregate whose network cost is O(blocks), the shape the 100-TB scan
    family must have."""
    import datetime

    lo = datetime.datetime.fromisoformat(f"{Q6_YEAR}-01-01")
    hi = datetime.datetime.fromisoformat(f"{int(Q6_YEAR) + 1}-01-01")
    li = read_parquet_clean(
        _doc_path(sf_dir, "lineitem"),
        columns=["l_extendedprice", "l_discount", "l_shipdate",
                 "l_quantity"],
        filter=(
            (pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi)
            & (pc.field("l_discount") >= Q6_DISC_LO)
            & (pc.field("l_discount") <= Q6_DISC_HI)
            & (pc.field("l_quantity") < Q6_MAX_QTY)
        ),
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        # integer-exact cents x basis points (q9 flake postmortem)
        p = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100)
        d = np.rint(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100)
        return pa.table({"part": pa.array([float(np.dot(p, d))],
                                          pa.float64())})

    total = (li.map_batches(rev_partial, batch_format="pyarrow",
                            batch_size=None)  # batch == block
             .aggregate(Sum("part", alias_name="s"))["s"]) or 0.0
    return pa.table({"revenue": pa.array([round(total / 1e4, 6)], pa.float64())})


SQL["q6_forecast_revenue"] = f"""
SELECT round(sum(round(l_extendedprice * 100)
                 * round(l_discount * 100)) / 10000.0, 6) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR}-01-01'
  AND l_shipdate < TIMESTAMP '{int(Q6_YEAR) + 1}-01-01'
  AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND l_quantity < {Q6_MAX_QTY}
"""


# --------------------------------------------- Q14: promo revenue share

Q14_MONTH_LO, Q14_MONTH_HI = "1996-04-01", "1996-05-01"
Q14_PROMO_TYPE = "PROMO"


def promo_revenue(sf_dir: str) -> pa.Table:
    """Q14 — TPC-H Q14 shape: conditional share of revenue attributable to
    one dimension attribute, for one month of the fact table.

    Pattern: the part dimension collapses to the MINIMUM broadcast state —
    a sorted int64 array of only the PROMO partkeys (membership, not
    payload; ~1/6 of an already-small dim). Each lineitem batch computes
    (promo_part, total_part) with one searchsorted + one dot product, so
    the exchange is two floats per block and the driver does one
    division."""
    import datetime

    lo = datetime.datetime.fromisoformat(Q14_MONTH_LO)
    hi = datetime.datetime.fromisoformat(Q14_MONTH_HI)
    promo = read_parquet_clean(
        _doc_path(sf_dir, "part"), columns=["p_partkey", "p_type"],
        filter=pc.field("p_type") == Q14_PROMO_TYPE)
    pk = np.sort(np.concatenate(
        [b["p_partkey"].to_numpy(zero_copy_only=False)
         for b in promo.iter_batches(batch_format="pyarrow",
                                     batch_size=65536)]
        or [np.empty(0, np.int64)]).astype(np.int64))
    pk_ref = ray.put(pk)

    def partials(batch: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        part = batch["l_partkey"].to_numpy(zero_copy_only=False)
        rev = (np.rint(batch["l_extendedprice"].to_numpy(
                   zero_copy_only=False) * 100)
               * (100.0 - np.rint(batch["l_discount"].to_numpy(
                   zero_copy_only=False) * 100)))
        pos = np.searchsorted(keys, part)
        pos[pos == keys.size] = 0
        is_promo = (keys[pos] == part) if keys.size else np.zeros(
            len(part), bool)
        return pa.table({
            "promo_part": pa.array([float(rev[is_promo].sum())],
                                   pa.float64()),
            "total_part": pa.array([float(rev.sum())], pa.float64()),
        })

    agg = (read_parquet_clean(
        _doc_path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi))
        .map_batches(partials, batch_format="pyarrow", batch_size=None)
        .aggregate(Sum("promo_part", alias_name="p"),
                   Sum("total_part", alias_name="t")))
    p, t = agg["p"] or 0.0, agg["t"] or 0.0
    share = 100.0 * p / t if t else None
    return pa.table({"promo_revenue": pa.array(
        [round(share, 6) if share is not None else None], pa.float64())})


SQL["q14_promo_revenue"] = f"""
SELECT round(100.0 * sum(CASE WHEN p_type = '{Q14_PROMO_TYPE}'
                              THEN round(l_extendedprice * 100)
                                   * (100 - round(l_discount * 100))
                              ELSE 0 END)
             / sum(round(l_extendedprice * 100)
                   * (100 - round(l_discount * 100))), 6) AS promo_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_MONTH_LO}'
  AND l_shipdate < TIMESTAMP '{Q14_MONTH_HI}'
"""


# ------------------------------------ Q4: order-priority EXISTS semi-join

Q4_QTR_LO, Q4_QTR_HI = "1996-07-01", "1996-10-01"
Q4_MIN_DISCOUNT = 0.09


def order_priority_check(sf_dir: str) -> pa.Table:
    """J14 — TPC-H Q4 shape (adapted to this schema: the EXISTS predicate is
    a deep-discount lineitem instead of commit<receipt, which the synthetic
    lineitem lacks): count a quarter's orders BY PRIORITY where at least one
    such lineitem exists.

    Pattern: distributed EXISTS. The inner side never joins — lineitem
    collapses to per-batch-unique qualifying orderkeys (a keys-only
    Dataset), `semi_id_filter` applies it to the orders scan (broadcast
    sorted-array probe <= 5M keys, sorted side-parquet range reads above),
    and the survivor count folds into O(priorities) rows per block. No
    all-to-all exchange anywhere."""
    import datetime

    lo = datetime.datetime.fromisoformat(Q4_QTR_LO)
    hi = datetime.datetime.fromisoformat(Q4_QTR_HI)

    def line_keys(batch: pa.Table) -> pa.Table:
        k = np.unique(batch["l_orderkey"].to_numpy(zero_copy_only=False))
        return pa.table({"o_orderkey": pa.array(k, pa.int64())})

    keys = read_parquet_clean(
        _doc_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_discount"],
        filter=pc.field("l_discount") > Q4_MIN_DISCOUNT,
    ).map_batches(line_keys, batch_format="pyarrow", batch_size=65536)

    orders = read_parquet_clean(
        _doc_path(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo)
        & (pc.field("o_orderdate") < hi))
    from ..stages.runs import semi_id_filter

    qualified = semi_id_filter(orders, keys, id_col="o_orderkey")

    def prio_partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch["o_orderpriority"].to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"o_orderpriority": pa.array(vals, pa.string()),
                         "cnt": pa.array(counts, pa.int64())})

    out = (qualified.map_batches(prio_partial, batch_format="pyarrow",
                                 batch_size=65536)
           .groupby("o_orderpriority")
           .aggregate(Sum("cnt", alias_name="order_count")))
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"),
                         promote_options="default")
    t = t.set_column(t.schema.get_field_index("order_count"),
                     "order_count", t["order_count"].cast(pa.int64()))
    return t.take(pc.sort_indices(t, sort_keys=[
        ("o_orderpriority", "ascending")]))


SQL["j14_order_priority"] = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_QTR_LO}'
  AND o_orderdate < TIMESTAMP '{Q4_QTR_HI}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_discount > {Q4_MIN_DISCOUNT})
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------ Q7: bilateral nation trade volume

Q7_NATION1, Q7_NATION2 = "NATION_1", "NATION_2"
Q7_SHIP_LO, Q7_SHIP_HI = "1995-01-01", "1999-01-01"


def _q7_reduce(k, side, code, yr, vol, skip_edge: bool):
    """Vectorized per-run join+reduce over arrays sorted by orderkey `k`:
    each run holds one dim row (side=1, customer code) and its lineitem
    rows (side=0, supplier code / year / volume). Returns packed partial
    keys (scode<<40 | ccode<<32 | year) and summed volumes; with
    `skip_edge` the first and last runs are excluded (they may continue in
    the neighboring block and are merged by the caller)."""
    if k.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    new = np.r_[True, k[1:] != k[:-1]]
    rid = np.cumsum(new) - 1
    nruns = rid[-1] + 1
    dim = side == 1
    ccode_run = np.zeros(nruns, np.int64)
    ccode_run[rid[dim]] = code[dim]
    keep = (~dim) & (ccode_run[rid] > 0)
    if skip_edge:
        keep &= (rid != 0) & (rid != nruns - 1)
    if not keep.any():
        return np.empty(0, np.int64), np.empty(0, np.float64)
    key = ((code[keep].astype(np.int64) << 40)
           | (ccode_run[rid[keep]] << 32)
           | yr[keep].astype(np.int64))
    u, inv = np.unique(key, return_inverse=True)
    return u, np.bincount(inv, weights=vol[keep])


def _q7_arrays(t: pa.Table):
    return (t["orderkey"].to_numpy(zero_copy_only=False),
            t["side"].to_numpy(zero_copy_only=False),
            t["code"].to_numpy(zero_copy_only=False),
            t["year"].to_numpy(zero_copy_only=False),
            t["vol"].to_numpy(zero_copy_only=False))


def nation_volume(sf_dir: str, nation1: str = Q7_NATION1,
                  nation2: str = Q7_NATION2) -> pa.Table:
    """Q7 — TPC-H Q7 shape: yearly shipping volume between two nations,
    keyed by (supplier nation, customer nation, ship year).

    Scale shape: BOTH nation predicates become sideways information
    passing. The supplier dim folds to a sorted (suppkey -> nation code)
    probe broadcast once; lineitem drops every non-pair supplier at scan
    time. The customer dim folds to the pair's custkeys; orders shrink to
    a keys-only (orderkey, cust_code) stream. Each side is then
    semi-filtered by the other's surviving orderkeys, so the one
    unavoidable exchange — a q3-style co-partition sort over the union of
    the two keys-only sides — moves rows proportional to the MATCH count.
    Per-block run scans reduce to O(nations^2 x years) partials; the first/
    last run of each block (<= 2 orderkeys) merges on the driver. Revenue
    sums round to 2 dp (q1 convention)."""
    import datetime

    from ..stages.runs import semi_id_filter

    lo = datetime.datetime.fromisoformat(Q7_SHIP_LO)
    hi = datetime.datetime.fromisoformat(Q7_SHIP_HI)
    names = {nation1: 1, nation2: 2}

    nat = read_parquet_clean(
        _doc_path(sf_dir, "nation"),
        columns=["n_nationkey", "n_name"]).take_all()
    code_of_nk = {int(r["n_nationkey"]): names[r["n_name"]]
                  for r in nat if r["n_name"] in names}

    def dim_probe(table: str, key_col: str, nk_col: str):
        rows = read_parquet_clean(
            _doc_path(sf_dir, table), columns=[key_col, nk_col],
            filter=pc.field(nk_col).isin(list(code_of_nk))).take_all()
        rows.sort(key=lambda r: int(r[key_col]))
        keys = np.array([int(r[key_col]) for r in rows], np.int64)
        codes = np.array([code_of_nk[int(r[nk_col])] for r in rows], np.int8)
        return ray.put((keys, codes))

    supp_ref = dim_probe("supplier", "s_suppkey", "s_nationkey")
    cust_ref = dim_probe("customer", "c_custkey", "c_nationkey")

    def probe(ref, vals):
        keys, codes = ray.get(ref)
        pos = np.searchsorted(keys, vals)
        pos = np.minimum(pos, max(keys.size - 1, 0))
        hit = (keys[pos] == vals) if keys.size else np.zeros(len(vals), bool)
        return hit, (codes[pos[hit]] if keys.size else np.empty(0, np.int8))

    def orders_side(batch: pa.Table) -> pa.Table:
        hit, codes = probe(cust_ref,
                           batch["o_custkey"].to_numpy(zero_copy_only=False))
        t = batch.filter(pa.array(hit))
        n = t.num_rows
        return pa.table({
            "orderkey": t["o_orderkey"].cast(pa.int64()),
            "side": pa.array(np.ones(n, np.int8)),
            "code": pa.array(codes),
            "year": pa.array(np.zeros(n, np.int32)),
            "vol": pa.array(np.zeros(n), pa.float64()),
        })

    def lineitem_side(batch: pa.Table) -> pa.Table:
        hit, codes = probe(supp_ref,
                           batch["l_suppkey"].to_numpy(zero_copy_only=False))
        t = batch.filter(pa.array(hit))
        # integer-exact basis points (q9 flake postmortem)
        price = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100)
        disc = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100)
        return pa.table({
            "orderkey": t["l_orderkey"].cast(pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int8)),
            "code": pa.array(codes),
            "year": pc.year(t["l_shipdate"]).cast(pa.int32()),
            "vol": pa.array(price * (100.0 - disc), pa.float64()),
        })

    orders = read_parquet_clean(
        _doc_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"],
    ).map_batches(orders_side, batch_format="pyarrow",
                  batch_size=65536).materialize()
    lines = read_parquet_clean(
        _doc_path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    ).map_batches(lineitem_side, batch_format="pyarrow", batch_size=65536)
    lines = semi_id_filter(lines, orders, id_col="orderkey").materialize()
    orders = semi_id_filter(orders, lines, id_col="orderkey")

    def block_join(batch: pa.Table) -> pa.Table:
        """Sorted block -> interior partials + raw edge-run rows."""
        empty = pa.table({
            "partial": pa.array([], pa.bool_()),
            "orderkey": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "code": pa.array([], pa.int8()),
            "year": pa.array([], pa.int32()),
            "vol": pa.array([], pa.float64()),
            "pkey": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        k, side, code, yr, vol = _q7_arrays(batch)
        u, sums = _q7_reduce(k, side, code, yr, vol, skip_edge=True)
        new = np.r_[True, k[1:] != k[:-1]]
        rid = np.cumsum(new) - 1
        edge = (rid == 0) | (rid == rid[-1])
        raw = batch.filter(pa.array(edge))
        inter = pa.table({
            "partial": pa.array(np.zeros(u.size, bool)),
            "orderkey": pa.array(np.zeros(u.size, np.int64)),
            "side": pa.array(np.full(u.size, -1, np.int8)),
            "code": pa.array(np.zeros(u.size, np.int8)),
            "year": pa.array(np.zeros(u.size, np.int32)),
            "vol": pa.array(sums, pa.float64()),
            "pkey": pa.array(u, pa.int64())})
        rawt = pa.table({
            "partial": pa.array(np.ones(raw.num_rows, bool)),
            "orderkey": raw["orderkey"],
            "side": raw["side"],
            "code": raw["code"],
            "year": raw["year"],
            "vol": raw["vol"],
            "pkey": pa.array(np.zeros(raw.num_rows, np.int64))})
        return pa.concat_tables([inter, rawt])

    seg = (orders.union(lines).sort("orderkey")
           .map_batches(block_join, batch_format="pyarrow", batch_size=None))

    inter_keys: list[np.ndarray] = []
    inter_vols: list[np.ndarray] = []
    bound: list[pa.Table] = []
    for b in seg.iter_batches(batch_format="pyarrow"):
        it = b.filter(pc.invert(b["partial"]))
        inter_keys.append(it["pkey"].to_numpy(zero_copy_only=False))
        inter_vols.append(it["vol"].to_numpy(zero_copy_only=False))
        bb = b.filter(b["partial"])
        if bb.num_rows:
            bound.append(bb)
    if bound:  # <= 2 orderkey runs per block: bounded driver merge
        bt = pa.concat_tables(bound)
        k, side, code, yr, vol = _q7_arrays(bt)
        order = np.lexsort((side, k))  # dim row first within its run
        u, sums = _q7_reduce(k[order], side[order], code[order], yr[order],
                             vol[order], skip_edge=False)
        inter_keys.append(u)
        inter_vols.append(sums)
    allk = np.concatenate(inter_keys) if inter_keys else np.empty(0, np.int64)
    allv = np.concatenate(inter_vols) if inter_vols else np.empty(0)
    u, inv = np.unique(allk, return_inverse=True)
    sums = np.bincount(inv, weights=allv) if u.size else np.empty(0)
    scode = (u >> 40).astype(int)
    ccode = ((u >> 32) & 0xFF).astype(int)
    years = (u & 0xFFFFFFFF).astype(np.int32)
    cross = scode != ccode  # the Q7 cross-nation predicate
    names_rev = {1: nation1, 2: nation2}
    rows = sorted(zip((names_rev[s] for s in scode[cross]),
                      (names_rev[c] for c in ccode[cross]),
                      years[cross].tolist(),
                      np.round(sums[cross] / 1e4, 2).tolist()))
    return pa.table({
        "supp_nation": pa.array([r[0] for r in rows], pa.string()),
        "cust_nation": pa.array([r[1] for r in rows], pa.string()),
        "l_year": pa.array([r[2] for r in rows], pa.int32()),
        "volume": pa.array([r[3] for r in rows], pa.float64()),
    })


SQL["q7_nation_volume"] = f"""
SELECT n_s.n_name AS supp_nation,
       n_c.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       round(sum(round(l_extendedprice * 100)
                 * (100 - round(l_discount * 100))) / 10000.0, 2) AS volume
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n_s ON n_s.n_nationkey = s_nationkey
JOIN nation n_c ON n_c.n_nationkey = c_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_SHIP_LO}'
  AND l_shipdate < TIMESTAMP '{Q7_SHIP_HI}'
  AND ((n_s.n_name = '{Q7_NATION1}' AND n_c.n_name = '{Q7_NATION2}')
    OR (n_s.n_name = '{Q7_NATION2}' AND n_c.n_name = '{Q7_NATION1}'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

# --------------------------------------- Q15: top supplier (max-over-agg)

Q15_QTR_LO, Q15_QTR_HI = "1996-01-01", "1996-04-01"


def top_supplier(sf_dir: str) -> pa.Table:
    """Q15 — TPC-H Q15 shape: the supplier(s) with the maximum revenue over
    one quarter (argmax over an aggregate, the "view + scalar subquery"
    pattern).

    Scale shape: the only exchange is the unavoidable per-supplier revenue
    sum — per-batch (suppkey, rev) combiner (np.unique + bincount bounds
    each block's output at its distinct suppliers) -> ONE groupby(suppkey).
    The aggregate's cardinality is the supplier DIMENSION, so the argmax
    and tie handling run on the driver over dimension-sized rows, and the
    supplier-name lookup is a pruned point read. Revenue rounds to 2 dp on
    BOTH sides BEFORE the max comparison, so float addition order cannot
    flip a tie."""
    import datetime

    lo = datetime.datetime.fromisoformat(Q15_QTR_LO)
    hi = datetime.datetime.fromisoformat(Q15_QTR_HI)

    def rev_partial(batch: pa.Table) -> pa.Table:
        k = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        # integer-exact basis points (q9 flake postmortem): the rounded
        # per-supplier totals — and the argmax winner set — are
        # block-layout independent
        rev = (np.rint(batch["l_extendedprice"].to_numpy(
                   zero_copy_only=False) * 100)
               * (100.0 - np.rint(batch["l_discount"].to_numpy(
                   zero_copy_only=False) * 100)))
        u, inv = np.unique(k, return_inverse=True)
        return pa.table({"l_suppkey": pa.array(u, pa.int64()),
                         "rev_part": pa.array(np.bincount(inv, weights=rev),
                                              pa.float64())})

    sums = (read_parquet_clean(
        _doc_path(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi))
        .map_batches(rev_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_suppkey")
        .aggregate(Sum("rev_part", alias_name="total_revenue"))
        .take_all())  # dimension-sized: one row per supplier
    if not sums:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_revenue": pa.array([], pa.float64())})
    rev = {int(r["l_suppkey"]): round(float(r["total_revenue"]) / 1e4, 2)
           for r in sums}
    best = max(rev.values())
    winners = sorted(k for k, v in rev.items() if v == best)
    names = {int(r["s_suppkey"]): r["s_name"] for r in read_parquet_clean(
        _doc_path(sf_dir, "supplier"), columns=["s_suppkey", "s_name"],
        filter=pc.field("s_suppkey").isin(winners)).take_all()}
    return pa.table({
        "s_suppkey": pa.array(winners, pa.int64()),
        "s_name": pa.array([names[k] for k in winners], pa.string()),
        "total_revenue": pa.array([best] * len(winners), pa.float64()),
    })


SQL["q15_top_supplier"] = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(round(l_extendedprice * 100)
                   * (100 - round(l_discount * 100))) / 10000.0, 2)
             AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_QTR_LO}'
    AND l_shipdate < TIMESTAMP '{Q15_QTR_HI}'
  GROUP BY l_suppkey)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ----------------------- Q17: small-quantity revenue (correlated subquery)

Q17_BRAND = "Brand#3"
Q17_QTY_FRACTION = 0.2
Q17_YEARS = 7.0


def small_qty_revenue(sf_dir: str, brand: str = Q17_BRAND) -> pa.Table:
    """Q17 — TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders of one brand's parts were not taken — the correlated scalar
    subquery (per-part avg quantity) pattern.

    Scale shape: the correlation decorrelates into TWO pruned scans of the
    same brand-filtered lineitem slice. The brand's partkeys broadcast as
    a sorted array (the dim filter makes them a small fraction of parts);
    pass 1 builds per-part (qty_sum, cnt) via the combiner + ONE
    groupby(partkey) bounded by the brand's part count; the resulting
    0.2*avg thresholds broadcast back; pass 2 is a pure scan whose only
    output is one float partial per block. l_quantity is integral so both
    sides compute the threshold from EXACT sums — the float compare cannot
    diverge from DuckDB."""
    parts = read_parquet_clean(
        _doc_path(sf_dir, "part"), columns=["p_partkey", "p_brand"],
        filter=pc.field("p_brand") == brand)
    pk = np.sort(np.concatenate([
        b["p_partkey"].to_numpy(zero_copy_only=False)
        for b in parts.iter_batches(batch_format="pyarrow", batch_size=65536)
    ] or [np.empty(0, np.int64)]).astype(np.int64))
    pk_ref = ray.put(pk)

    def brand_filter(batch: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, lp)
        pos = np.minimum(pos, max(keys.size - 1, 0))
        hit = (keys[pos] == lp) if keys.size else np.zeros(len(lp), bool)
        return batch.filter(pa.array(hit))

    def qty_partial(batch: pa.Table) -> pa.Table:
        k = batch["l_partkey"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(k, return_inverse=True)
        return pa.table({
            "l_partkey": pa.array(u, pa.int64()),
            "q_part": pa.array(np.bincount(inv, weights=q), pa.float64()),
            "n_part": pa.array(np.bincount(inv).astype(np.int64)),
        })

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    li = read_parquet_clean(_doc_path(sf_dir, "lineitem"), columns=li_cols
                            ).map_batches(brand_filter,
                                          batch_format="pyarrow",
                                          batch_size=65536)
    stats = (li.map_batches(qty_partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("l_partkey")
             .aggregate(Sum("q_part", alias_name="qsum"),
                        Sum("n_part", alias_name="cnt"))
             .take_all())  # bounded by the brand's part count
    tk = np.array(sorted(int(r["l_partkey"]) for r in stats), np.int64)
    thr = {int(r["l_partkey"]):
           Q17_QTY_FRACTION * float(r["qsum"]) / float(r["cnt"])
           for r in stats}
    tv = np.array([thr[int(k)] for k in tk], np.float64)
    thr_ref = ray.put((tk, tv))

    def price_partial(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(thr_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, lp)  # every row's part is in keys
        small = (batch["l_quantity"].to_numpy(zero_copy_only=False)
                 < vals[pos]) if keys.size else np.zeros(len(lp), bool)
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({"part": pa.array([float(p[small].sum())],
                                          pa.float64())})

    total = (li.map_batches(price_partial, batch_format="pyarrow",
                            batch_size=None)
             .aggregate(Sum("part", alias_name="s"))["s"]) or 0.0
    return pa.table({"avg_yearly": pa.array(
        [round(total / Q17_YEARS, 2)], pa.float64())})


SQL["q17_small_qty_revenue"] = f"""
SELECT round(sum(l_extendedprice) / {Q17_YEARS}, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND l_quantity < (SELECT {Q17_QTY_FRACTION} * avg(l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""
