"""Measured single-core CPU reference floors (BASELINE.md)."""
