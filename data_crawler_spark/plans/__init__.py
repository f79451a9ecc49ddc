"""Plans: multi-operator programs — the crawl round loop, snapshot
state management, lineage. State lives in versioned tables (never in
executor memory) so a crawl is resumable mid-run (BASELINE.json:6,14)."""
