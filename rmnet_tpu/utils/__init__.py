"""Utilities: DAVIS metrics, meters, summaries, visualization, checkpoints."""
