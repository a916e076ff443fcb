"""Placeholder — filled in by later milestones."""
QUERIES = {}
ORACLE = {}
