"""Pure + vectorized scalar functions shared by the oracle spec and the
Spark UDFs. Keeping one implementation is what makes the exact-match
obligations (crawl order, URL-seen set, byte-identical text —
BASELINE.json:2,14,15) testable."""
