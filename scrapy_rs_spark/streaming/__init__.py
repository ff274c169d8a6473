"""Structured Streaming surface.

The reference is continuous-async but terminates when the scheduler
drains (engine/src/lib.rs:519) — batch-iterative rounds are the
faithful Spark model (SURVEY.md §7.0), so streaming is a thin optional
layer: continuous frontier ingestion (readStream over the frontier
directory) feeding the same round operators. Populated as needed.
"""
