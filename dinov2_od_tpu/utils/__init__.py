"""Utilities: logging, benchmarking, profiling, memory stats."""
