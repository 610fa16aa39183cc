"""Property-based fuzzing of the relational core (SURVEY.md §5 Layer 2).

Hypothesis generates random filter + aggregate compositions over the
customer table; each is built twice from the same spec — once with the
DataFrame API, once as DuckDB SQL — and the results must hash-match.
This covers predicate/aggregate combinations the hand-written §2 queries
don't enumerate (boundary values, AND/OR nesting, empty results).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.oracle import compare_frames

SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

predicate = st.one_of(
    st.tuples(
        st.just("c_acctbal"),
        st.sampled_from(["<", "<=", ">", ">=", "="]),
        st.floats(min_value=-1000, max_value=10000, allow_nan=False).map(
            lambda v: round(v, 2)
        ),
    ),
    st.tuples(
        st.just("c_nationkey"),
        st.sampled_from(["<", "<=", ">", ">=", "="]),
        st.integers(min_value=0, max_value=24),
    ),
    st.tuples(st.just("c_mktsegment"), st.just("="), st.sampled_from(SEGMENTS)),
)

query_spec = st.tuples(
    st.lists(predicate, min_size=1, max_size=3),
    st.sampled_from(["AND", "OR"]),
    st.sampled_from(["c_mktsegment", "c_nationkey"]),
)


def _spark_filter(df, preds, combiner):
    conds = []
    for col, op, val in preds:
        c = F.col(col)
        conds.append(
            {"<": c < val, "<=": c <= val, ">": c > val, ">=": c >= val, "=": c == val}[op]
        )
    combined = conds[0]
    for c in conds[1:]:
        combined = (combined & c) if combiner == "AND" else (combined | c)
    return df.filter(combined)


def _sql_text(preds, combiner, group_col):
    def lit(val):
        return f"'{val}'" if isinstance(val, str) else repr(val)

    where = f" {combiner} ".join(f"({col} {op} {lit(val)})" for col, op, val in preds)
    return f"""
        SELECT {group_col},
               count(*) AS n,
               round(sum(c_acctbal), 2) AS total_bal,
               round(avg(c_acctbal), 4) AS avg_bal,
               count(DISTINCT c_nationkey) AS n_nations
        FROM customer WHERE {where} GROUP BY {group_col}
    """


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf_dir}/customer.parquet')"
    )
    yield con
    con.close()


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(spec=query_spec)
def test_random_filter_agg_matches_duckdb(spark, sf_dir, duck, spec):
    preds, combiner, group_col = spec
    df = _spark_filter(load_table(spark, sf_dir, "customer"), preds, combiner)
    spark_pdf = (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.countDistinct("c_nationkey").alias("n_nations"),
        )
        .toPandas()
    )
    oracle_pdf = duck.execute(_sql_text(preds, combiner, group_col)).df()
    res = compare_frames("property", spark_pdf, oracle_pdf)
    assert res.ok, f"{spec}: {res.message()}"


# ---------------------------------------------------------------------------
# Join-surface fuzzing: random (join type × predicate) compositions over
# customer ⋈ nation must match DuckDB. Covers the null-extension and
# existence semantics the hand-written §2 join queries fix at one predicate.
# ---------------------------------------------------------------------------

join_spec = st.tuples(
    st.sampled_from(["inner", "left", "semi", "anti"]),
    st.integers(min_value=0, max_value=24),   # nation-key threshold
    st.floats(min_value=-500, max_value=8000, allow_nan=False).map(
        lambda v: round(v, 2)
    ),                                         # acctbal threshold
)


@pytest.fixture(scope="module")
def duck2(sf_dir):
    con = duckdb.connect()
    for t in ("customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(spec=join_spec)
def test_random_join_matches_duckdb(spark, sf_dir, duck2, spec):
    jt, nk_thr, bal_thr = spec
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= bal_thr)
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") <= nk_thr)
    cond = cust.c_nationkey == nat.n_nationkey
    if jt in ("semi", "anti"):
        joined = cust.join(nat, cond, f"left_{jt}").select(
            "c_custkey", F.round("c_acctbal", 2).alias("bal")
        )
        op = "IN" if jt == "semi" else "NOT IN"
        sql = f"""
            SELECT c_custkey, round(c_acctbal, 2) AS bal
            FROM customer WHERE c_acctbal >= {bal_thr}
              AND c_nationkey {op}
                  (SELECT n_nationkey FROM nation WHERE n_nationkey <= {nk_thr})
        """
    else:
        joined = cust.join(nat, cond, jt).select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("bal"),
            "n_name",
        )
        sql = f"""
            SELECT c_custkey, round(c_acctbal, 2) AS bal, n_name
            FROM customer {'LEFT' if jt == 'left' else ''} JOIN
                 (SELECT * FROM nation WHERE n_nationkey <= {nk_thr}) n
              ON c_nationkey = n.n_nationkey
            WHERE c_acctbal >= {bal_thr}
        """
    res = compare_frames("join-property", joined.toPandas(), duck2.execute(sql).df())
    assert res.ok, f"{spec}: {res.message()}"
