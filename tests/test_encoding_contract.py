"""Type-hazard regression gate for the testdata fixture contract.

The driver's testdata changed `events.ts` encoding between rounds
(TIMESTAMP(NANOS) -> TIMESTAMP(MICROS, isAdjustedToUTC=false)), which
PySpark reads as TIMESTAMP_NTZ and which broke every `unix_micros(ts)`
call site in round 2 (VERDICT r2, What's wrong #1). This test rewrites
events.parquet in all three encodings the fixture has or could ship —
UTC-adjusted micros (TIMESTAMP), naive micros (TIMESTAMP_NTZ), and
nanos (legacy) — and asserts every catalog entry at least ANALYZES
(`.schema`, no execution) against each. A future encoding change fails
here pre-ship instead of in the driver's CORRECTNESS run.
"""

from __future__ import annotations

import os

import pytest

from backend_etl_spark.catalog import REGISTRY

ENCODINGS = ["timestamp", "timestamp_ntz", "timestamp_nanos"]

#: streaming entries execute on build (not lazily analyzable); the
#: stateful sessionizer's events staging is covered by test_streaming.py.
SKIP_PREFIXES = ("streaming_",)


@pytest.fixture(scope="module")
def encoded_dirs(sf_dir, tmp_path_factory):
    """One copy of sf0.001 per events.ts encoding (other tables symlinked)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    table = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    ts = table.column("ts")
    naive_us = ts.cast(pa.timestamp("us"))
    variants = {
        # isAdjustedToUTC=true -> Spark TIMESTAMP (LTZ)
        "timestamp": pc.assume_timezone(naive_us, "UTC"),
        # isAdjustedToUTC=false -> Spark TIMESTAMP_NTZ (current fixture)
        "timestamp_ntz": naive_us,
        # TIMESTAMP(NANOS) -> Spark rejects / reads as BIGINT with
        # spark.sql.legacy.parquet.nanosAsLong (round-1 fixture)
        "timestamp_nanos": naive_us.cast(pa.timestamp("ns")),
    }
    dirs = {}
    for enc, col in variants.items():
        d = tmp_path_factory.mktemp(f"events_{enc}")
        idx = table.schema.get_field_index("ts")
        pq.write_table(
            table.set_column(idx, pa.field("ts", col.type), col),
            str(d / "events.parquet"),
            # keep nanos physical nanos (2.6 logical type), not µs-coerced
            coerce_timestamps=None,
            store_schema=False,
        )
        for f in os.listdir(sf_dir):
            if f != "events.parquet":
                os.symlink(os.path.join(sf_dir, f), str(d / f))
        dirs[enc] = str(d)
    return dirs


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_every_catalog_entry_analyzes(spark, encoded_dirs, encoding):
    d = encoded_dirs[encoding]
    failures: list[str] = []
    for name, spec in REGISTRY.items():
        if any(name.startswith(p) for p in SKIP_PREFIXES):
            continue
        try:
            df = spec.fn(spark, d)
            _ = df.schema  # forces full analysis without execution
        except Exception as exc:  # noqa: BLE001 - collect, report per-entry
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:200]}")
    assert not failures, (
        f"{len(failures)} catalog entries fail to analyze with events.ts "
        f"encoded as {encoding}:\n" + "\n".join(failures)
    )


def test_loader_normalizes_all_encodings_to_timestamp(spark, encoded_dirs):
    """The loader contract itself: every encoding lands as session-UTC
    TIMESTAMP with identical values."""
    from backend_etl_spark.sources.loader import load_table

    rows = {}
    for enc, d in encoded_dirs.items():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", enc
        rows[enc] = df.select("event_id", "ts").orderBy("event_id").limit(50).collect()
    assert rows["timestamp"] == rows["timestamp_ntz"] == rows["timestamp_nanos"]
