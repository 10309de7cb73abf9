"""Benchmark harnesses (throughput, MFU scorecard)."""
