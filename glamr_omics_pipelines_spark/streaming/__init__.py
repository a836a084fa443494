"""Incremental / streaming ingestion (SURVEY §2.10)."""
