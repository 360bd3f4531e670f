"""Structured Streaming surface.

The reference is single-shot batch (SURVEY.md §2.8) — its only incremental
affordance is re-validation on graph swap (updateDataGraph, index.js:235-269).
This package provides the streaming analogs:

  incremental.IncrementalValidator — micro-batches of triples appended to the
  graph; only focus nodes affected by each batch are re-validated.

  events.windowed_counts — watermarked tumbling-window aggregation for
  append streams (the canonical readStream -> window -> writeStream shape).

  sessions.sessionize_stream — per-user session-gap operator with arbitrary
  state (applyInPandasWithState); sessions.sessionize_batch is its
  lag-window batch twin.
"""

from .events import windowed_counts
from .incremental import IncrementalValidator
from .sessions import sessionize_batch, sessionize_stream
