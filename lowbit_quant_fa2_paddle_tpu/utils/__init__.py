"""Harness utilities: benchmarking, logging, flags."""
