"""Sources & sinks: seed lists, feed fixtures + parser, the synthetic
image store, and the snapshot store (Iceberg-style atomic commits on
parquet — see snapshots.py for why)."""
