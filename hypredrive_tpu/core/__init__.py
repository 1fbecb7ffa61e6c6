"""Core runtime: errors, logging, stats, runtime registry, system info."""
