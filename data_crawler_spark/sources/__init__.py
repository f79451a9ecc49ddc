"""Sources: fixture loaders (driver parquet tables), seed-list source,
and the deterministic synthetic Common-Crawl-style web generator."""
