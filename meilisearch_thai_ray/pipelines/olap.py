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
