from networkit_spark.streaming.edge_stream import (
    edge_events_from_stream,
    incremental_connected_components,
    windowed_edge_counts,
)
