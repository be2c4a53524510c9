"""Skew-aware partitioning helpers (SURVEY §4 "salted repartition").

A bare ``groupby(key)`` sends every row of a hot key to one reducer.
The salted two-phase pattern bounds any reducer's share to
``1/num_salts`` of the hot key:

1. phase 1 groups by ``(key, salt)`` where ``salt = row_hash % S`` —
   a hot key fans out over S reducers;
2. phase 2 groups the (at most ``S * distinct_keys``) partials by
   ``key`` alone — tiny.

For mergeable aggregates (count/sum/min/max, sketches) the result is
exact.  ``salted_agg`` applies the pattern for Count/Sum.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def add_salt(batch: pa.Table, salt_from: str, num_salts: int,
             out: str = 'salt') -> pa.Table:
    """Append ``salt = hash64(salt_from) % num_salts`` (vectorized-ish)."""
    vals = batch.column(salt_from)
    if pa.types.is_integer(vals.type):
        salts = pc.cast(
            pc.bit_wise_and(vals, pa.scalar((1 << 62) - 1, vals.type)),
            pa.int64())
        salts = pc.cast(
            pc.subtract(salts, pc.multiply(
                pc.divide(salts, pa.scalar(num_salts, pa.int64())),
                pa.scalar(num_salts, pa.int64()))), pa.int32())
    else:
        from ..kernels.urls import url_hash64
        salts = pa.array(
            [url_hash64(str(v)) % num_salts for v in vals.to_pylist()],
            pa.int32())
    return batch.append_column(out, salts)


def salted_agg(ds, key: str, value_col: str | None = None,
               num_salts: int = 8, salt_from: str | None = None):
    """Exact count (+ optional sum of ``value_col``) per ``key`` using
    the two-phase salted shuffle.  Returns a Dataset with columns
    ``key``, ``n`` (+ ``sum_<value_col>``).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    salt_src = salt_from or value_col or key

    def phase1(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch partials keyed by (key, salt): the shuffle carries
        # one row per (key, salt) per batch
        salt = (pd.util.hash_pandas_object(df[salt_src], index=False)
                % num_salts).astype('int64')
        g = df.assign(__salt=salt)
        aggs = {'n': (key, 'size')}
        if value_col:
            aggs['sum_' + value_col] = (value_col, 'sum')
        return (g.groupby([key, '__salt'], as_index=False)
                 .agg(**aggs).drop(columns=['__salt']))

    partials = ds.map_batches(phase1, batch_format='pandas')
    aggs = [Sum('n', alias_name='n')]
    if value_col:
        aggs.append(Sum('sum_' + value_col, alias_name='sum_' + value_col))
    return partials.groupby(key).aggregate(*aggs)
