"""Sources & sinks: parquet star-schema loader, range-partitioned raw
zone (the reference's GCS layout re-expressed as partitioned columnar
storage), schema-file source, and the data-type registry."""
