from .lane import (  # noqa: F401
    dq_route_stream,
    events_stream,
    run_dlq_routing,
    run_streaming_dedupe,
    run_upsert,
    run_windowed_audit,
)
