"""Structured Streaming operators (SURVEY §2.10) + shared drain tuning.

``drain_conf`` pins ``spark.sql.shuffle.partitions`` (which fixes the
STATE partition count for the lifetime of a streaming query's
checkpoint) to a state-volume-matched value for the catalog's bounded
availableNow drains. The default session value (32, CPU-matched for
batch shuffles) makes every stateful micro-batch pay 32 state-store
open/commit cycles per stateful operator — measured 7.8 s -> 2.3 s on
the stream-stream join at sf0.1 with identical results when dropped
to 8. Results are partition-count-independent (all streamed
aggregations/joins here are commutative or exactly-rounded, attested
against order-insensitive batch oracles).

At 100 TB this is the same knob pointed the other way: size state
partitions to watermark-bounded state volume (raise it), don't inherit
whatever the batch shuffle width happens to be. Each query's count is
locked into its checkpoint at first start — our drains always start
from a fresh checkpoint, so the pin is safe.

The pin applies ONLY to drains whose per-batch cost is state-store
open/commit cycles (stream-stream joins, dropDuplicates state, windowed
aggs over few keys). Drains that are per-batch COMPUTE (foreachBatch
partial-sketch builds — no state store at all — and
applyInPandasWithState, where the partition count is the Python-worker
parallelism) pass ``n=None`` and inherit the session's tuned batch
width instead: pinning those to 8 was measured 1.5x slower at sf0.1
(r6 postmortem — sessionize 2.88->4.41 s, CMS topk 3.06->4.53 s,
CMS merge 2.37->3.81 s) because it throttled 32-core compute to 8
tasks while saving nothing on state stores they don't use.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

#: state partitions for bounded test-scale drains; a production
#: deployment sizes this to state volume (bigger, not smaller)
STATE_PARTITIONS = 8


@contextmanager
def drain_conf(spark: SparkSession, n: int | None = STATE_PARTITIONS):
    """Temporarily pin the shuffle/state partition count around a
    streaming start()+awaitTermination(); restores the session value.

    ``n=None`` = inherit the session's (tuned) width unchanged — for
    compute-bound drains (foreachBatch builds, applyInPandasWithState)
    where the partition count is task parallelism, not state-store
    count (see module docstring)."""
    if n is None:
        yield
        return
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
