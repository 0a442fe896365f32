"""Pure, deterministic per-record/per-batch functions.

Everything in this package is free of Ray dependencies so the same code runs
inside ``map_batches`` UDFs, in the plain-Python test oracle, and in DuckDB
parity checks.
"""
