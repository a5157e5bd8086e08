"""Sketch-accelerated operators: bounded-memory summaries (count-min,
bloom — see dedup/incremental.py) that PRUNE work while the final answer
stays exact."""
