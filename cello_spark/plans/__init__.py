"""Pipeline orchestration: stage manifest, checkpoint/resume at stage
granularity, per-partition lineage metrics."""
