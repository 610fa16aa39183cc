"""Column-expression vector math shared by similarity/dedup/multimodal ops.

All helpers return Catalyst Column expressions built from higher-order
array functions — JVM-side, codegen-friendly, no Python in the row path,
no UDF pickling. Elements are cast to double *before* arithmetic so the
accumulation precision matches the DuckDB oracles (which do the same).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a, b) -> Column:
    """Σ aᵢ·bᵢ with double accumulation (sequential, matching list_sum)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a) -> Column:
    """Σ aᵢ² with double accumulation."""
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a, b) -> Column:
    """Cosine similarity; NULL-free inputs assumed (corpus embeddings)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# The DuckDB spellings of the same expressions (kept adjacent so query and
# oracle stay in lockstep; {col} placeholders filled by callers).
SQL_SQ_NORM = "list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
SQL_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))"
)


def sql_l2_norm(a: str) -> str:
    return f"sqrt({SQL_SQ_NORM.format(a=a)})"


def sql_cosine(a: str, b: str) -> str:
    return f"({SQL_DOT.format(a=a, b=b)} / ({sql_l2_norm(a)} * {sql_l2_norm(b)}))"
