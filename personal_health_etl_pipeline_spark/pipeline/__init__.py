from personal_health_etl_pipeline_spark.pipeline.etl import (
    PipelineConfig,
    run_extract,
    run_pipeline,
    run_transform,
    warehouse_distinct_days,
    warehouse_has_day,
)
from personal_health_etl_pipeline_spark.pipeline.raw_zone import (
    OverlappingRangeError,
    landed_ranges,
    max_landed_date,
    scan_raw,
    write_raw,
)

__all__ = [
    "PipelineConfig",
    "run_extract",
    "run_pipeline",
    "run_transform",
    "warehouse_distinct_days",
    "warehouse_has_day",
    "OverlappingRangeError",
    "landed_ranges",
    "max_landed_date",
    "scan_raw",
    "write_raw",
]
