"""Sources & sinks: columnar table store (Lance w/ Parquet fallback), simulated web."""
