"""Checkpoint manifests and resume logic."""
