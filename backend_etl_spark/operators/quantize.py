"""Embedding quantization: symmetric int8 (max-abs) quantization of
``array<float>`` embedding columns — the standard memory/IO reduction
step before shipping vectors to an ANN index (4× smaller, and most
index structures take int8 natively).

Pure array expressions: per-vector scale, elementwise round-to-int, and
reconstruction-error metrics — map-only, no UDF, no shuffle. The
dequantization error folds run in array order on both engines
(F.aggregate here, list_reduce in the DuckDB oracle), so results are
bit-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Q_MAX = 127.0


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda v: v.cast("double"))


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Symmetric max-abs int8 quantization with reconstruction metrics.

    Output per vector: the quantization scale, the L1 mass of the int8
    vector (an integer — an exact cross-engine checksum of the quantized
    values), and the max absolute dequantization error. Vectors whose
    max-abs is 0 carry no information and are dropped (documented
    contract; the oracle applies the same filter).

    The input is widened first (``spread``): the per-vector
    quantize/reconstruct expressions are higher-order array functions
    (interpreted, not codegen'd — ~1 ms/vector), so a single-split
    local scan serializes the whole pass on one core. No-op at real
    scale where the scan already yields many splits.
    """
    from backend_etl_spark.operators.partitioning import spread

    df = spread(df, id_col)
    v = _as_double(F.col(emb_col))
    mx = F.array_max(F.transform(v, F.abs))
    scale = F.lit(Q_MAX) / mx
    q = F.transform(v, lambda x: F.round(x * scale).cast("int"))
    err = F.array_max(
        F.zip_with(v, q, lambda x, qi: F.abs(x - qi.cast("double") / scale))
    )
    return (
        df.select(
            F.col(id_col),
            mx.alias("_mx"),
            scale.alias("_scale"),
            q.alias("_q"),
            err.alias("_err"),
        )
        .where(F.col("_mx") > 0)
        .select(
            id_col,
            F.round("_scale", 6).alias("q_scale"),
            F.aggregate(
                F.transform("_q", lambda x: F.abs(x).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("q_l1"),
            F.round("_err", 6).alias("max_abs_err"),
        )
    )
