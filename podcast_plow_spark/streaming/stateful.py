"""Custom stateful streaming operator: per-host politeness budget
enforcement with ``applyInPandasWithState``.

This is the streaming analog of the batch engine's per-host cap
(reference semantics: the sequential crawler can never exceed its
politeness budget because it sleeps between fetches — reference
``server/services/evidence.py:414-441``). In a stream, the budget is
*state*: each host's group keeps a running count of URLs admitted in
the current window; arrivals beyond ``max_per_window`` are emitted
with ``admitted = false`` (to be re-queued by the sink).

State schema: (window_start long, count long). Host grouping gives
the same co-location guarantee as the batch engine's host_hash
partitioning — one host's budget is one group's state, never split.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["limit_host_rate"]

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url_canon", StringType()),
        StructField("admitted", BooleanType()),
        StructField("host_seq", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("admitted_total", LongType())])


def limit_host_rate(candidates: DataFrame, max_per_batch: int = 2) -> DataFrame:
    """Admit at most ``max_per_batch`` URLs per host per micro-batch;
    the admission count accumulates in group state across batches so
    ``host_seq`` is a stable per-host sequence number."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (host,) = key
        (total,) = state.get if state.exists else (0,)
        admitted_this_batch = 0
        for pdf in pdfs:
            out = []
            for url in pdf["url_canon"]:
                ok = admitted_this_batch < max_per_batch
                if ok:
                    admitted_this_batch += 1
                    total += 1
                out.append(
                    {"host": host, "url_canon": url, "admitted": ok,
                     "host_seq": total if ok else -1}
                )
            yield pd.DataFrame(out)
        state.update((total,))

    return candidates.groupBy("host").applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
