"""Non-empty twins for the two zero-row oracle passes (VERDICT r6 #5).

`q_join_anti` and `q_except` both pass their driver oracles with ZERO rows
at the test scale factors (every customer has an order; every customer
nation has a supplier) — a hash match on the empty set is the weakest
possible pass and would not notice an anti-join lowered as semi or an
EXCEPT lowered as INTERSECT. These twins run the SAME operators on a
filtered base frame that forces a non-empty result, assert rows > 0, and
hash-check against DuckDB. The driver-hashed originals are untouched.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.oracle import compare_frames, duckdb_connection

import pytest


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


def test_join_anti_nonempty_twin(spark, sf_dir, duck):
    """Anti join against ONE quarter of orders: customers whose orders all
    fall outside 1995-Q1 (plus true zero-order customers) must surface."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-04-01")
    )
    got = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .toPandas()
    )
    assert len(got) > 0, "twin must force a non-empty anti result"
    oracle = duck.execute(
        """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= DATE '1995-01-01'
            AND o_orderdate <  DATE '1995-04-01')
        """
    ).df()
    r = compare_frames("q_join_anti_nonempty_twin", got, oracle)
    assert r.ok, r.message()


def test_except_nonempty_twin(spark, sf_dir, duck):
    """EXCEPT against suppliers of a single region: customer nations outside
    that region must survive the set difference."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    got = (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .subtract(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .toPandas()
    )
    assert len(got) > 0, "twin must force a non-empty except result"
    oracle = duck.execute(
        """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier WHERE s_nationkey < 5
        """
    ).df()
    r = compare_frames("q_except_nonempty_twin", got, oracle)
    assert r.ok, r.message()
