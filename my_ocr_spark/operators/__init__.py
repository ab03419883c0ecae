"""Spark DataFrame operators of the extraction engine."""
