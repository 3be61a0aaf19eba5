"""Mesh construction, sharding rules, and multi-chip execution helpers."""
