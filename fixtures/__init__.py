"""Deterministic crawl-domain fixtures (FIXTURES.md §A) — pure Python.

Importable without pyspark so the oracle and unit tests share the exact same
inputs the Spark engine reads.
"""
