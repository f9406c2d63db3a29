"""Sinks: N-Triples/N-Quads text, Turtle, and adjacency-Parquet layouts."""
