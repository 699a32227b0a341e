"""Orchestration: engine (jitted streaming inference), train, test, inference."""
