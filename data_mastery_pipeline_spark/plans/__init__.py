"""Physical-plan introspection & scale-discipline assertions."""

from .inspect import (  # noqa: F401
    broadcast_join_count,
    cartesian_product_count,
    exchange_count,
    formatted_plan,
    pushed_filters,
    read_schema_columns,
    runtime_bloom_filter_present,
    scan_count,
)
