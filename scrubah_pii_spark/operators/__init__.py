"""DataFrame-level operators. Pandas/Arrow UDFs only where built-in
expressions genuinely can't express the semantics (scrub cascade, simhash
bit-parity, perplexity)."""
