"""Scale-contract tests for the TPC-H-analog fact-table joins.

Round-4 verdict: six analogs (q4/q7/q8/q12/q18/order_fulfillment_latency)
materialized the full ``orders`` fact table on the driver via
``pa.concat_tables(ray.get(ds.to_arrow_refs()))`` and broadcast it — correct
at sf0.01, O(|fact|) driver memory at scale.  They are now shuffle hash
joins on the orderkey (q13's distinct-customer set likewise stays
distributed via a left-outer shuffle join).  This test pins the contract:
``to_arrow_refs`` may only ever be called on datasets whose schema carries
NO raw fact-table columns — i.e. only bounded derived sets (q18's
thresholded survivors: (o_orderkey, qty_e2)) may reach the driver.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

SF_DIR = "/root/testdata/sf0.001"

# Raw per-row fact columns: any dataset still carrying one of these is
# (a projection of) the orders/lineitem fact tables, not a bounded
# aggregate, and must never be collected driver-side.
FACT_RAW_COLUMNS = {
    "o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice",
    "l_shipdate", "l_quantity", "l_extendedprice", "l_discount",
    "l_suppkey", "l_partkey",
    "p_type", "p_brand", "p_size", "p_retailprice",
}

QUERY_NAMES = [
    "q4_priority_check",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_late_lines",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_bracketed_revenue",
    "q22_global_sales_opportunity",
    "order_fulfillment_latency",
]


def _consume(out):
    import ray

    if isinstance(out, ray.data.Dataset):
        return out.to_pandas()
    if isinstance(out, pa.Table):
        return out.to_pandas()
    return out


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_fact_table_driver_materialization(ray_session, monkeypatch, name):
    import ray

    from rastertiler_rs_ray.pipelines import driver_queries as dq

    orig = ray.data.Dataset.to_arrow_refs

    def guarded(self, *a, **kw):
        schema = self.schema()
        cols = set(schema.names) if schema is not None else set()
        bad = cols & FACT_RAW_COLUMNS
        assert not bad, (
            f"{name}: driver-side to_arrow_refs on a fact-shaped dataset "
            f"(raw fact columns {sorted(bad)} in schema {sorted(cols)})"
        )
        return orig(self, *a, **kw)

    monkeypatch.setattr(ray.data.Dataset, "to_arrow_refs", guarded)

    fn = getattr(dq, name)
    df = _consume(fn(SF_DIR))
    assert len(df) > 0


def test_q13_includes_zero_order_customers(ray_session, tmp_path):
    """The left-outer shuffle join must surface customers with NO orders
    as the c_count=0 histogram bucket.  The synthetic corpus gives every
    customer at least one order, so plant three orderless customers."""
    import shutil

    import duckdb
    import pyarrow.parquet as pq

    from rastertiler_rs_ray.pipelines import driver_queries as dq

    cust = pq.read_table(f"{SF_DIR}/customer.parquet")
    hi = int(pc.max(cust.column("c_custkey")).as_py())
    extra_keys = [hi + 1, hi + 2, hi + 3]
    extra = pa.table(
        {
            name: (
                pa.array(extra_keys, cust.schema.field(name).type)
                if name == "c_custkey"
                else pa.nulls(len(extra_keys), cust.schema.field(name).type)
            )
            for name in cust.column_names
        }
    )
    pq.write_table(pa.concat_tables([cust, extra]), tmp_path / "customer.parquet")
    shutil.copy(f"{SF_DIR}/orders.parquet", tmp_path / "orders.parquet")

    df = _consume(dq.q13_customer_distribution(str(tmp_path))).sort_values("c_count")
    con = duckdb.connect()
    exp = con.execute(
        f"""
        WITH c_orders AS (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM '{tmp_path}/customer.parquet' c
          LEFT JOIN '{tmp_path}/orders.parquet' o ON o.o_custkey = c.c_custkey
          GROUP BY c.c_custkey)
        SELECT c_count, count(*) AS custdist FROM c_orders GROUP BY c_count
        ORDER BY c_count
        """
    ).fetch_df()
    assert 0 in set(df["c_count"])
    np.testing.assert_array_equal(
        df["c_count"].to_numpy(np.int64), exp["c_count"].to_numpy(np.int64)
    )
    np.testing.assert_array_equal(
        df["custdist"].to_numpy(np.int64), exp["custdist"].to_numpy(np.int64)
    )
