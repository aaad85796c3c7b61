"""Registry entries for the event-time surface (SURVEY.md §2 I5) over
the driver ``events`` table. The registered queries run the BATCH form
of the same expression trees the streaming paths use
(``streaming/incremental.py``); pytest drives the actual streaming
queries (watermark + foreachBatch) end-to-end."""

from __future__ import annotations

import os

from ..streaming.incremental import (
    SESSIONIZED_SQL,
    WINDOWED_EVENTS_SQL,
    sessionized_events,
    windowed_event_counts,
)
from .registry import register


def _events(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


@register("events_windowed", WINDOWED_EVENTS_SQL)
def events_windowed(spark, sf_dir):
    return windowed_event_counts(_events(spark, sf_dir))


@register("events_sessionized", SESSIONIZED_SQL, extended=True)
def events_sessionized(spark, sf_dir):
    return sessionized_events(_events(spark, sf_dir))
