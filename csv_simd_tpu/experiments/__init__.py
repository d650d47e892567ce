"""Experiments: the stage-1 machinery applied beyond CSV."""
