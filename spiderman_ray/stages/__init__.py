"""Ray Data stages: dedup, fetch, parse+sink, decode/validate."""
