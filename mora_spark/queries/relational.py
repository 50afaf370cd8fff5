"""Placeholder — populated in a later milestone."""

QUERIES: dict = {}
ORACLES: dict = {}
