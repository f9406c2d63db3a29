"""Sources: pages parquet, raw document files, N-Quads text."""
