from .stream import (  # noqa: F401
    read_events_stream,
    run_streaming_dedup,
    run_streaming_dedup_window_chain,
    run_streaming_foreachbatch_upsert,
    run_streaming_hourly,
    run_streaming_ohlc,
    run_streaming_sessions,
    run_streaming_sliding_window,
    run_streaming_stateful_counter,
    run_streaming_static_join,
    run_streaming_stream_join,
    run_streaming_tws_counter,
)
