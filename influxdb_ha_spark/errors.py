"""Engine error taxonomy (kept import-light: timeutil and other leaf
modules raise these without pulling in the planner)."""


class QueryError(Exception):
    """Maps to HTTP 400 in the server façade (query_handler.go error path)."""


class PartitionKeyError(QueryError):
    """Strict mode: query tags don't cover the partition key
    (coordinator.go:185-193 — the reference errors instead of scanning)."""
