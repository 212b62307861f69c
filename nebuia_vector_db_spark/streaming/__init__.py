from nebuia_vector_db_spark.streaming.events import (  # noqa: F401
    dedup_stream,
    hourly_counts_stream,
    read_events_stream,
    run_to_memory,
    sessionize_stream,
)
from nebuia_vector_db_spark.streaming.stateful import (  # noqa: F401
    running_user_totals,
)
