from shuttle_spark.sources.io import (
    read,
    read_stream,
    write,
    write_bucketed_table,
    write_partitioned,
)

__all__ = [
    "read",
    "read_stream",
    "write",
    "write_bucketed_table",
    "write_partitioned",
]
