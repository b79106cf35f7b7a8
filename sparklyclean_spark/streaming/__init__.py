"""Event-time windowing: batch window aggregations (oracle-checkable)
and Structured Streaming wrappers with watermarks."""
