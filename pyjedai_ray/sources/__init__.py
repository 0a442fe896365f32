"""Sources / sinks: schema-validated Parquet readers and the deterministic
webpages corpus synthesizer (BASELINE.json input_hint shape)."""
