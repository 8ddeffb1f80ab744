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
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"part": pa.array([float(np.dot(p, d))],
                                          pa.float64())})

    total = (li.map_batches(rev_partial, batch_format="pyarrow",
                            batch_size=None)  # batch == block
             .aggregate(Sum("part", alias_name="s"))["s"]) or 0.0
    return pa.table({"revenue": pa.array([round(total, 6)], pa.float64())})


SQL["q6_forecast_revenue"] = f"""
SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue
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
        rev = (batch["l_extendedprice"].to_numpy(zero_copy_only=False)
               * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)))
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
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
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
