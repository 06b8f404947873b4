"""Observability: metric writers, profiler hooks, model summaries, drawing."""
