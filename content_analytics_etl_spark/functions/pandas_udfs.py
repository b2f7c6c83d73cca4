"""Pandas-UDF surface (SURVEY.md §7: "pandas_udf scalar / grouped-agg /
applyInPandas demonstrations kept minimal and only where built-ins
can't express the op").

Policy: UDFs are the slow path — every op here has (or is tested
against) a built-in-expression twin, and the UDFs exist to demonstrate
the Arrow-batched escape hatch shape, not to replace expressions:

- scalar ``pandas_udf``: vectorized per-row math over Arrow batches
  (numpy inside, no per-row Python crossing);
- grouped-agg ``pandas_udf``: one scalar per group, usable inside
  ``groupBy().agg`` next to built-ins;
- stateless ``applyInPandas``: whole-group pandas computation when the
  result genuinely needs the group as a frame (here: OLS slope).

All three scale the same way: Arrow batches flow per partition/group,
nothing is collected to the driver, and grouped forms shuffle once on
the group key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = ["l2_norm_pd", "weighted_mean_pd", "per_group_trend"]


# explicit DataType (not a DDL string): DDL parsing needs an active
# SparkSession, which doesn't exist at import time
@pandas_udf(T.DoubleType())
def l2_norm_pd(vec: pd.Series) -> pd.Series:
    """Scalar pandas UDF: L2 norm of an array column, vectorized via a
    stacked numpy matrix per Arrow batch. Expression twin:
    ``functions.vectors.l2_norm`` (fold) — bit-equality is NOT promised
    (numpy reassociates), agreement is to float tolerance."""
    mat = np.stack(vec.to_numpy())
    return pd.Series(np.sqrt((mat * mat).sum(axis=1)))


@pandas_udf(T.DoubleType())
def weighted_mean_pd(v: pd.Series, w: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-agg pandas UDF: Σvw/Σw per group. Expression twin:
    ``sum(v*w)/sum(w)``."""
    denom = float(w.sum())
    return float((v * w).sum() / denom) if denom else float("nan")


_TREND_SCHEMA = "user_id long, n long, slope double"


def _ols_slope(pdf: pd.DataFrame) -> pd.DataFrame:
    t = pdf["ts"].astype("int64").to_numpy(dtype="float64")  # epoch ns
    v = pdf["value"].to_numpy(dtype="float64")
    t = (t - t.mean()) / 1e9  # centered seconds — conditioning
    denom = float((t * t).sum())
    slope = float((t * v).sum() / denom) if denom else float("nan")
    return pd.DataFrame(
        {"user_id": [int(pdf["user_id"].iloc[0])], "n": [len(pdf)], "slope": [slope]}
    )


def per_group_trend(events: DataFrame) -> DataFrame:
    """Stateless ``applyInPandas``: per-user OLS slope of value over
    time (value units / second). Expression twin:
    ``covar_pop(t, v) / var_pop(t)`` — tested equal to tolerance."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_ols_slope, schema=_TREND_SCHEMA)
    )


class SplitTokenRuns:
    """Python UDTF (Spark 4 ``udtf``): explode a text value into its
    maximal same-character-class token runs — one output row per run
    with its position and class. The UDTF surface is the table-valued
    escape hatch next to the scalar/grouped ones above; its expression
    twin is ``posexplode(regexp_extract_all(...))`` + a CASE class
    label, and the test asserts row-level equality against that twin.

    Scale shape: evaluated per input row inside the executor (LATERAL
    join), no driver involvement, no shuffle of its own.
    """

    def eval(self, doc_id: int, text: str):  # noqa: A003 - UDTF contract
        if text is None:
            return
        import re

        for pos, m in enumerate(
            re.finditer(r"[a-z]+|[0-9]+|[^a-z0-9 ]", text.lower())
        ):
            piece = m.group(0)
            cls = (
                "alpha"
                if piece[0].isalpha()
                else ("digit" if piece[0].isdigit() else "punct")
            )
            yield doc_id, pos, piece, cls


def split_token_runs_udtf():
    """Register-ready UDTF object (``udtf`` decorator applied lazily so
    importing this module never needs an active SparkSession)."""
    from pyspark.sql.functions import udtf

    return udtf(
        SplitTokenRuns,
        returnType="doc_id bigint, pos int, piece string, cls string",
    )
