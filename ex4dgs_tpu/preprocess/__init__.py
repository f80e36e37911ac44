"""Offline dataset preparation: frame extraction + known-pose COLMAP
triangulation pipelines for N3V and Technicolor captures."""
