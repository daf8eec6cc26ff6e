"""Structured Streaming faces of the engine (SURVEY.md §3.2 Spark shape):

- :mod:`feed` — the change feed as a stream (``readStream`` over the
  append-only feed log; swap the file source for
  ``format("kafka")`` + the same transformations on a cluster).
- :mod:`revisions` — gapless per-document revision assignment with
  ``applyInPandasWithState`` (the streaming replacement for the
  reference's ShardProcessor single-writer guarantee).
- :mod:`ingest` — the write path as a stream job: commands →
  ``foreachBatch`` → bucket-grouped executor-side DocumentStore writes
  (one batch = one feed publication + one atomic manifest flip).
- :mod:`kafka` — the production transport: command topic in, feed
  topic out (``format("kafka")`` wiring + payload codecs; the codecs
  and option plumbing are broker-free testable).

Operator-side ``foreachBatch`` STATE SINKS (persisted pointer-flip
state with the shared replay guard, operators/rollup_mv.py) live next
to their batch twins: ``operators.rollup_mv.streaming_rollup``
(continuous aggregates), ``operators.sampling.
streaming_uniform_sample`` (deterministic bottom-k corpus sample),
``operators.sketches.streaming_heavy_hitters`` (mergeable count-min +
pigeonhole admission), ``operators.dedup.streaming_corpus_stats``
(continuous incremental dedup + per-language stats), and
``operators.expectations.streaming_expectations`` (continuous
data-quality gate with quarantine).
"""

from .feed import feed_readstream
from .ingest import run_command_stream, write_commands
from .kafka import feed_kafka_sink, kafka_command_stream
from .revisions import assign_revisions_stream
from .joins import stream_interval_join
from .windows import session_windows, stream_dedup, windowed_event_counts

__all__ = [
    "feed_readstream",
    "assign_revisions_stream",
    "run_command_stream",
    "write_commands",
    "windowed_event_counts",
    "session_windows",
    "stream_dedup",
    "stream_interval_join",
    "kafka_command_stream",
    "feed_kafka_sink",
]
