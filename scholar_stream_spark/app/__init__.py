"""Consumption layer: the engine's analog of the reference dashboard."""
