from nebuia_vector_db_spark.streaming.events import (  # noqa: F401
    hourly_counts_stream,
    read_events_stream,
    run_to_memory,
    sessionize_stream,
)
