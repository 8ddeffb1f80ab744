"""The last three TPC-H join shapes (Q2 / Q11 / Q20), adapted to this
testdata's tables: there is no `partsupp`, so the part<->supplier relation
is DERIVED FROM LINEITEM (supply cost := min unit price ever charged;
"stock"/availability := shipped quantity) — the join/aggregate SHAPES are
the TPC-H ones, the derivation is documented per query, and every entry is
DuckDB-hash-verified with the same derivation on both sides.

q2_min_cost_supplier: correlated min-per-group join-back (the Q2 shape) —
    group to a per-(part,supplier) min, then keep the rows achieving their
    part's minimum, decorated from broadcast dimension maps.
q11_important_parts: group sum vs a GLOBAL scalar fraction (the Q11
    HAVING-over-total shape) — one combine, one scalar, one filter.
q20_promo_suppliers: nested aggregate semi-join (the Q20 shape) — per
    (supplier, part) two period sums packed into ONE int64 combine, the
    qualifying pair set reduced to distinct suppliers.

Scale shapes: every query broadcasts its dimension filters (part /
supplier / nation / region are the small sides — sorted-key searchsorted
probes via ray.put) so the lineitem scan is pruned IN PLACE and only
per-batch combiner partials — never fact rows — enter the single
per-query exchange (`stages/runs.sum_by_int_key` sort+reduceat combine,
or one bounded groupby for the min). Money sums ride as integer cents
(the repo's integer-exact convention); quantity sums are integral in
TPC-H so packing two of them into disjoint int64 lanes is carry-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..sources.documents import read_parquet_clean
from ..stages.runs import sum_by_int_key
from .simple_text import _doc_path

SQL: dict[str, str] = {}


# ------------------------------------- Q2: min-cost supplier per part

Q2_REGION = "ASIA"
Q2_MAX_SIZE = 10
Q2_TYPE = "STANDARD"
Q2_LIMIT = 100
_Q2_KEYMUL = 1 << 20  # (partkey, suppkey) -> one int64; suppkey < 2^20


def _round6_half_away(x: float) -> float:
    """round(x, 6) with DuckDB's half-away-from-zero tie rule. Needed
    because 2-dp prices / integral quantities produce binary-EXACT
    6-dp ties (e.g. cents/32 -> ...6875), where Python's banker's
    rounding deterministically disagrees with SQL."""
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def _isin_sorted(vals: np.ndarray, sorted_keys: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(sorted_keys, vals)
    idx = np.minimum(idx, max(len(sorted_keys) - 1, 0))
    return sorted_keys[idx] == vals if sorted_keys.size else \
        np.zeros(vals.shape, bool)


def min_cost_supplier(sf_dir: str, region: str = Q2_REGION,
                      max_size: int = Q2_MAX_SIZE,
                      p_type: str = Q2_TYPE) -> pa.Table:
    """Q2 (adapted) — for each qualifying part (size <= max_size, exact
    type), the region's suppliers charging the MINIMUM unit price, where
    supply cost derives from lineitem: min(l_extendedprice / l_quantity)
    per (part, supplier). Correlated-subquery shape: min within part,
    join back on equality.

    Scale shape: part and supplier/nation/region filters broadcast
    (sorted partkeys + supplier dict via ray.put); the lineitem scan
    prunes to qualifying (part, ASIA-supplier) rows and combines to
    per-batch (pair -> min unit price) partials; ONE bounded
    groupby(pair).min (pairs <= qualifying parts x region suppliers);
    the per-part min + join-back run on the driver over that tiny
    result. Unit price division is float64 on both sides (same IEEE
    bits as DuckDB), and min is order-independent, so no rounding
    convention is needed before the final 6-dp display rounding."""
    parts = read_parquet_clean(
        _doc_path(sf_dir, "part"),
        columns=["p_partkey", "p_brand", "p_size", "p_type"],
        filter=(pc.field("p_size") <= max_size)
        & (pc.field("p_type") == p_type)).take_all()
    pbrand = {int(r["p_partkey"]): r["p_brand"] for r in parts}
    pk_sorted = np.array(sorted(pbrand), np.int64)

    nation = read_parquet_clean(
        _doc_path(sf_dir, "nation"),
        columns=["n_nationkey", "n_name", "n_regionkey"]).take_all()
    region_keys = {int(r["r_regionkey"]) for r in read_parquet_clean(
        _doc_path(sf_dir, "region"), columns=["r_regionkey", "r_name"],
        filter=pc.field("r_name") == region).take_all()}
    nname = {int(r["n_nationkey"]): r["n_name"] for r in nation
             if int(r["n_regionkey"]) in region_keys}
    supp = read_parquet_clean(
        _doc_path(sf_dir, "supplier"),
        columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
    ).take_all()
    sinfo = {int(r["s_suppkey"]):
             (r["s_name"], float(r["s_acctbal"]),
              nname[int(r["s_nationkey"])])
             for r in supp if int(r["s_nationkey"]) in nname}
    sk_sorted = np.array(sorted(sinfo), np.int64)
    if not pk_sorted.size or not sk_sorted.size:
        return _q2_empty()
    pk_ref, sk_ref = ray.put(pk_sorted), ray.put(sk_sorted)

    def pair_min_partial(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        keep = (_isin_sorted(p, ray.get(pk_ref))
                & _isin_sorted(s, ray.get(sk_ref)))
        if not keep.any():
            return pa.table({"pair": pa.array([], pa.int64()),
                             "cost_part": pa.array([], pa.float64())})
        cost = (batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
                / batch["l_quantity"].to_numpy(zero_copy_only=False)[keep])
        pair = p[keep] * _Q2_KEYMUL + s[keep]
        u, inv = np.unique(pair, return_inverse=True)
        m = np.full(u.size, np.inf)
        np.minimum.at(m, inv, cost)
        return pa.table({"pair": pa.array(u, pa.int64()),
                         "cost_part": pa.array(m, pa.float64())})

    pair_min = (read_parquet_clean(
        _doc_path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])
        .map_batches(pair_min_partial, batch_format="pyarrow",
                     batch_size=65536)
        .groupby("pair").min("cost_part").take_all())

    best: dict[int, float] = {}
    for r in pair_min:
        pk = int(r["pair"]) // _Q2_KEYMUL
        c = float(r["min(cost_part)"])
        if pk not in best or c < best[pk]:
            best[pk] = c
    rows = []
    for r in pair_min:
        pk, sk = divmod(int(r["pair"]), _Q2_KEYMUL)
        c = float(r["min(cost_part)"])
        if c == best[pk]:
            name, bal, nat = sinfo[sk]
            rows.append((bal, name, nat, pk, pbrand[pk], c))
    rows.sort(key=lambda t: (-t[0], t[1], t[3]))
    rows = rows[:Q2_LIMIT]
    return pa.table({
        "s_acctbal": pa.array([_round6_half_away(t[0]) for t in rows],
                              pa.float64()),
        "s_name": pa.array([t[1] for t in rows], pa.string()),
        "n_name": pa.array([t[2] for t in rows], pa.string()),
        "p_partkey": pa.array([t[3] for t in rows], pa.int64()),
        "p_brand": pa.array([t[4] for t in rows], pa.string()),
        "ps_cost": pa.array([_round6_half_away(t[5]) for t in rows],
                            pa.float64()),
    })


def _q2_empty() -> pa.Table:
    return pa.table({
        "s_acctbal": pa.array([], pa.float64()),
        "s_name": pa.array([], pa.string()),
        "n_name": pa.array([], pa.string()),
        "p_partkey": pa.array([], pa.int64()),
        "p_brand": pa.array([], pa.string()),
        "ps_cost": pa.array([], pa.float64()),
    })


SQL["q2_min_cost_supplier"] = f"""
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(l_extendedprice / l_quantity) AS ps_cost
  FROM lineitem GROUP BY 1, 2
), elig AS (
  SELECT ps.ps_partkey, ps.ps_cost, s.s_name, s.s_acctbal,
         n.n_name, p.p_brand
  FROM ps JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
       JOIN nation n ON n.n_nationkey = s.s_nationkey
       JOIN region r ON r.r_regionkey = n.n_regionkey
       JOIN part p ON p.p_partkey = ps.ps_partkey
  WHERE r.r_name = '{Q2_REGION}' AND p.p_size <= {Q2_MAX_SIZE}
    AND p.p_type = '{Q2_TYPE}'
)
SELECT round(s_acctbal, 6) AS s_acctbal, s_name, n_name,
       CAST(ps_partkey AS BIGINT) AS p_partkey, p_brand,
       round(ps_cost, 6) AS ps_cost
FROM elig e
WHERE ps_cost = (SELECT min(ps_cost) FROM elig e2
                 WHERE e2.ps_partkey = e.ps_partkey)
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT {Q2_LIMIT}
"""


# --------------------------- Q11: parts above a global value fraction

Q11_NATION = "NATION_7"
Q11_FRACTION = 0.001


def important_parts(sf_dir: str, nation: str = Q11_NATION,
                    fraction: float = Q11_FRACTION) -> pa.Table:
    """Q11 (adapted) — parts whose traded value through one nation's
    suppliers exceeds `fraction` of that nation's total traded value;
    value derives from lineitem (sum of l_extendedprice) instead of
    partsupp stock value. The HAVING-vs-global-scalar shape.

    Scale shape: the nation's suppkeys broadcast (tiny); the lineitem
    scan prunes and combines per batch to (partkey -> cents) partials;
    ONE sum_by_int_key combine; the global total is a driver sum over
    the combined result (part-cardinality, already small); integer
    cents keep the sum addition-order-exact."""
    nk = {int(r["n_nationkey"]) for r in read_parquet_clean(
        _doc_path(sf_dir, "nation"), columns=["n_nationkey", "n_name"],
        filter=pc.field("n_name") == nation).take_all()}
    sk = sorted(int(r["s_suppkey"]) for r in read_parquet_clean(
        _doc_path(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"],
    ).take_all() if int(r["s_nationkey"]) in nk)
    sk_ref = ray.put(np.array(sk, np.int64))

    def cents_partial(batch: pa.Table) -> pa.Table:
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        keep = _isin_sorted(s, ray.get(sk_ref))
        if not keep.any():
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)[keep]
        cents = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        u, inv = np.unique(p, return_inverse=True)
        return pa.table({
            "l_partkey": pa.array(u, pa.int64()),
            "cents": pa.array(np.bincount(inv, weights=cents).astype(
                np.int64), pa.int64()),
        })

    combined = sum_by_int_key(
        read_parquet_clean(
            _doc_path(sf_dir, "lineitem"),
            columns=["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(cents_partial, batch_format="pyarrow",
                     batch_size=65536),
        "l_partkey", "cents", out_col="cents_sum").take_all()
    total = sum(int(r["cents_sum"]) for r in combined)
    rows = [(int(r["l_partkey"]), int(r["cents_sum"])) for r in combined
            if r["cents_sum"] > fraction * total]
    rows.sort(key=lambda t: (-t[1], t[0]))
    return pa.table({
        "ps_partkey": pa.array([t[0] for t in rows], pa.int64()),
        "value": pa.array([round(t[1] / 100.0, 2) for t in rows],
                          pa.float64()),
    })


SQL["q11_important_parts"] = f"""
WITH v AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name = '{Q11_NATION}')
  GROUP BY 1)
SELECT CAST(l_partkey AS BIGINT) AS ps_partkey,
       round(cents / 100.0, 2) AS value
FROM v
WHERE cents > {Q11_FRACTION} * (SELECT sum(cents) FROM v)
ORDER BY value DESC, ps_partkey
"""


# ------------------------ Q20: suppliers concentrated in one period

Q20_PART_PREFIX = "small"
Q20_YEAR = 1997
Q20_SHARE = 0.5
Q20_MIN_QTY = 60
_Q20_LANE = 1 << 32  # year-qty in the high int64 lane, total in the low


def promo_suppliers(sf_dir: str, prefix: str = Q20_PART_PREFIX,
                    year: int = Q20_YEAR) -> pa.Table:
    """Q20 (adapted) — suppliers having some qualifying part (name
    prefix) whose {Q20_YEAR} shipped quantity exceeds half that pair's
    all-time shipped quantity, at meaningful volume (>= {Q20_MIN_QTY}):
    availability derives from shipped lineitem quantity instead of
    partsupp.ps_availqty. The nested-aggregate semi-join shape.

    Scale shape: qualifying partkeys broadcast; per (supplier, part)
    TWO period sums ride ONE sum_by_int_key combine by packing
    (year_qty << 32) | total_qty into disjoint int64 lanes — quantities
    are integral and pair totals << 2^31, so lane sums never carry; the
    qualifying pair set reduces to distinct suppliers on the driver
    (bounded by the supplier table)."""
    pk = sorted(int(r["p_partkey"]) for r in read_parquet_clean(
        _doc_path(sf_dir, "part"), columns=["p_partkey", "p_name"],
    ).take_all() if r["p_name"].startswith(prefix))
    pk_ref = ray.put(np.array(pk, np.int64))

    def packed_partial(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        keep = _isin_sorted(p, ray.get(pk_ref))
        if not keep.any():
            return pa.table({"pair": pa.array([], pa.int64()),
                             "packed": pa.array([], pa.int64())})
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        q = batch["l_quantity"].to_numpy(
            zero_copy_only=False)[keep].astype(np.int64)
        yr = batch["l_shipdate"].to_numpy(
            zero_copy_only=False)[keep].astype("datetime64[Y]")
        in_year = (yr == np.datetime64(str(year), "Y")).astype(np.int64)
        pair = s * _Q2_KEYMUL + p[keep]
        packed = in_year * q * _Q20_LANE + q
        u, inv = np.unique(pair, return_inverse=True)
        return pa.table({
            "pair": pa.array(u, pa.int64()),
            "packed": pa.array(np.bincount(inv, weights=packed).astype(
                np.int64), pa.int64()),
        })

    combined = sum_by_int_key(
        read_parquet_clean(
            _doc_path(sf_dir, "lineitem"),
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
        .map_batches(packed_partial, batch_format="pyarrow",
                     batch_size=65536),
        "pair", "packed", out_col="packed_sum").take_all()
    qual: set[int] = set()
    for r in combined:
        year_qty, total = divmod(int(r["packed_sum"]), _Q20_LANE)
        if total >= Q20_MIN_QTY and year_qty > Q20_SHARE * total:
            qual.add(int(r["pair"]) // _Q2_KEYMUL)
    if not qual:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string())})
    sname = {int(r["s_suppkey"]): r["s_name"] for r in read_parquet_clean(
        _doc_path(sf_dir, "supplier"), columns=["s_suppkey", "s_name"],
        filter=pc.field("s_suppkey").isin(sorted(qual))).take_all()}
    keys = sorted(qual)
    return pa.table({
        "s_suppkey": pa.array(keys, pa.int64()),
        "s_name": pa.array([sname[k] for k in keys], pa.string()),
    })


SQL["q20_promo_suppliers"] = f"""
WITH sp AS (
  SELECT l_suppkey, l_partkey,
         sum(CAST(l_quantity AS BIGINT)) AS qty_total,
         sum(CASE WHEN year(l_shipdate) = {Q20_YEAR}
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS qty_year
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE '{Q20_PART_PREFIX}%')
  GROUP BY 1, 2)
SELECT DISTINCT CAST(sp.l_suppkey AS BIGINT) AS s_suppkey, s.s_name
FROM sp JOIN supplier s ON s.s_suppkey = sp.l_suppkey
WHERE qty_total >= {Q20_MIN_QTY} AND qty_year > {Q20_SHARE} * qty_total
ORDER BY s_suppkey
"""
