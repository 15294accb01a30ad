"""Durable engine state: two-phase manifest commit, watermarks, lineage."""
