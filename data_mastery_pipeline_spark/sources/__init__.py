"""Sources & sinks (SURVEY §2.A): partitioned parquet writers, a
Python-Data-Source REST ingester, JDBC serving wrappers, and the
pipeline run-log / retention lifecycle."""
