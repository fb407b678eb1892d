"""Standalone tools: dataset download, result analysis."""
