"""Q2/Q11/Q20 adapted TPC-H shapes (pipelines/olap3.py): DuckDB parity
under tiny blocks (boundary-merge stress), empty-filter schemas, and the
carry-free int64 two-lane packing contract."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from meilisearch_thai_ray.pipelines import olap3

SF = "/root/testdata/sf0.001"
TABLES = ["part", "supplier", "nation", "region", "lineitem"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _tiny_blocks():
    import ray.data

    ctx = ray.data.DataContext.get_current()
    return ctx, ctx.target_max_block_size


@pytest.mark.parametrize("name,fn_name", [
    ("q2_min_cost_supplier", "min_cost_supplier"),
    ("q11_important_parts", "important_parts"),
    ("q20_promo_suppliers", "promo_suppliers"),
])
def test_duckdb_parity_under_tiny_blocks(ray_session, con, name, fn_name):
    ctx, saved = _tiny_blocks()
    ctx.target_max_block_size = 8 * 1024
    try:
        got = getattr(olap3, fn_name)(SF).to_pandas()
    finally:
        ctx.target_max_block_size = saved
    exp = con.execute(olap3.SQL[name]).fetchdf()
    got = got[sorted(got.columns)].sort_values(
        sorted(got.columns)).reset_index(drop=True)
    exp = exp[sorted(exp.columns)].sort_values(
        sorted(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_q2_empty_filter_keeps_schema(ray_session):
    out = olap3.min_cost_supplier(SF, region="NOWHERE")
    assert out.num_rows == 0
    assert out.column_names == ["s_acctbal", "s_name", "n_name",
                                "p_partkey", "p_brand", "ps_cost"]


def test_q20_no_matching_parts_keeps_schema(ray_session):
    out = olap3.promo_suppliers(SF, prefix="zzz-no-such-part")
    assert out.num_rows == 0
    assert out.column_names == ["s_suppkey", "s_name"]


def test_round6_half_away_matches_duckdb_boundaries(con):
    for x in (810.7046875, 699.0896875, 0.0000005, -810.7046875, 1.25):
        exp = con.execute("SELECT round(CAST(? AS DOUBLE), 6)",
                          [x]).fetchone()[0]
        assert olap3._round6_half_away(x) == exp, x


def test_q20_lane_packing_is_carry_free():
    # worst case: every lineitem of a pair lands in the target year at
    # max TPC-H quantity — the low lane stays far below 2^32
    qty = np.full(10_000, 50, np.int64)
    packed = (qty * olap3._Q20_LANE + qty).sum()
    year_qty, total = divmod(int(packed), olap3._Q20_LANE)
    assert year_qty == total == 500_000
