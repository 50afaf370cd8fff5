"""Column-level function library: text analysis and vector math."""
