"""Cross-cutting utilities: profiling, block timing, structured logging."""
