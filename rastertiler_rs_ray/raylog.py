"""Targeted filter for a benign Ray Data executor warning.

Ray's sort/aggregate exchange emits ZERO-COLUMN empty blocks for empty
reduce partitions (reproducible with a stock ``groupby().map_groups``
over 64 blocks and 2 keys — no user code involved), and the streaming
executor then logs::

    Operator produced a RefBundle with a different schema than the
    previous one. Previous schema: <real schema>, new schema: .

Ray itself treats the symmetric case (empty OLD schema → real schema)
as benign and silent (``dedupe_schemas_with_validation`` returns early
when ``_is_empty_schema(old_schema)``); the real→empty direction is the
same no-op — the executor keeps the old schema — but logs a scary
warning once per operator.  Our own stages are schema-stable (pinned by
tests); this filter drops ONLY the empty-new-schema variant so real
schema divergences still surface.
"""

from __future__ import annotations

import logging

_EXECUTOR_LOGGER = "ray.data._internal.execution.streaming_executor_state"
_EMPTY_SCHEMA_MARKS = (
    # Arrow rendering of a zero-column empty block
    "new schema: . This may lead",
    # pandas rendering of the same (sort/aggregate exchange over pandas blocks)
    "new schema: PandasBlockSchema(names=[], types=[]). This may lead",
)


class _EmptySchemaDivergenceFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        try:
            msg = record.getMessage()
            return not any(m in msg for m in _EMPTY_SCHEMA_MARKS)
        except Exception:
            return True


_FILTER = _EmptySchemaDivergenceFilter()

# Second benign warning: transform_pyarrow.unify_schemas tries
# ``len(set(schemas)) == 1`` as a dedup fast path, but pyarrow Schemas
# are UNHASHABLE whenever they carry ANY metadata (hash(schema) raises
# "unhashable type: 'dict'" — reproducible with
# ``hash(pa.schema([...]).with_metadata({b"a": b"b"}))``), and Ray's own
# pandas→arrow block conversion attaches b'pandas' metadata to every
# block a ``batch_format="pandas"`` stage emits.  The fallback path it
# then takes is the general unify — identical result, one log line per
# reduce task.  Parquet sources strip metadata at the read
# (driver_queries._read); this filter drops the noise from the
# unavoidable pandas-stage blocks.
_UNIFY_LOGGER = "ray.data._internal.arrow_ops.transform_pyarrow"
_HASH_MARK = "Failed to hash the schemas (for deduplication)"


class _SchemaHashNoiseFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        try:
            return _HASH_MARK not in record.getMessage()
        except Exception:
            return True


_HASH_FILTER = _SchemaHashNoiseFilter()


def install_empty_schema_warning_filter() -> None:
    """Idempotently attach the benign-warning filters."""
    logger = logging.getLogger(_EXECUTOR_LOGGER)
    if _FILTER not in logger.filters:
        logger.addFilter(_FILTER)
    ulogger = logging.getLogger(_UNIFY_LOGGER)
    if _HASH_FILTER not in ulogger.filters:
        ulogger.addFilter(_HASH_FILTER)
