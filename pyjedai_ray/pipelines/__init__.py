"""End-to-end pipelines: checkpointed flagship web dedup, config-driven
workflow runner."""
