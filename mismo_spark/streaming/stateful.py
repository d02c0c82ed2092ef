"""Cross-batch stateful dedup — the ``applyInPandasWithState`` operator.

``incremental.py`` covers stream-static linkage (blocking keys are
deterministic projections, so a stream-static equi-join suffices).
What an equi-join canNOT express is *cross-batch first-occurrence*
semantics: "emit each fingerprint the first time it is ever seen,
suppress every later occurrence across all future micro-batches".
That requires per-key state that outlives a micro-batch → Spark's
arbitrary-stateful-processing operator, Arrow-batched
(``applyInPandasWithState``), never row-at-a-time.

Scale notes: state is one boolean + one id per distinct fingerprint,
hash-partitioned by the streaming engine across executors; the operator
shuffles each micro-batch once on the fingerprint (same key as a batch
``groupBy`` dedup would).  At 100 TB the state store (RocksDB in prod
config) holds |distinct fingerprints| entries — the same cardinality a
batch dedup's shuffle would materialize, but amortized across batches.

Reference: the batch-side equivalent is exact_dedupe_keep_first
(mismo_spark/dedupe); the reference project is batch-only (SURVEY.md
§2.11) so this is a Spark-native extension, not a port.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("seen", BooleanType()),
        StructField("first_id", LongType()),
    ]
)


def stateful_dedupe_stream(
    stream: DataFrame,
    *,
    key_column: str,
    id_column: str,
) -> DataFrame:
    """First-occurrence dedup across micro-batches.

    Groups the stream by ``key_column`` (e.g. a text fingerprint); per
    key, the FIRST row ever seen (ties within a batch broken by min
    ``id_column``) is emitted, all later rows — in this batch or any
    future one — are dropped.  State per key: (seen, first_id).

    Returns the deduped streaming DataFrame (output mode must be
    ``append``).
    """
    out_schema = stream.schema

    def dedupe_fn(key, pdf_iter, state: GroupState):
        if state.exists:
            # already emitted in an earlier batch: drain and drop
            for _ in pdf_iter:
                pass
            return
        first: pd.DataFrame | None = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            cand = pdf.nsmallest(1, id_column)
            if first is None or (
                cand[id_column].iloc[0] < first[id_column].iloc[0]
            ):
                first = cand
        if first is not None:
            state.update((True, int(first[id_column].iloc[0])))
            yield first

    return (
        stream.groupBy(key_column)
        .applyInPandasWithState(
            dedupe_fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
